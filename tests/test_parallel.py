"""Sharding tests on the 8-device virtual CPU mesh (conftest.py).

Validates the two sharded programs the framework runs multi-chip:
the data-parallel training step (params replicated, batch sharded,
GSPMD gradient all-reduce) and the batched search with the env/tree
batch sharded over ``dp``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from takzero_tpu.models.network import NetConfig
from takzero_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from takzero_tpu.tak import engine


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def test_dp_train_step_matches_single_device(mesh):
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.train.data import make_batch, random_pretraining_targets
    from takzero_tpu.train.learner import make_optimizer, make_train_step

    cfg = NetConfig(n=3, half_komi=0, filters=8, blocks=1, novelty="none")
    eng = engine(3, half_komi=0)
    rng = np.random.default_rng(0)
    targets = random_pretraining_targets(eng, 16, rng)
    batch = make_batch(eng, targets, np.random.default_rng(1), augment=False)

    tx = make_optimizer()
    step = jax.jit(make_train_step(cfg, tx), static_argnames=("train_ube",))

    # Single device.
    b0 = new_agent(cfg, seed=0)
    s0 = tx.init(b0["params"])
    b1, _, m_single = step(b0, s0, batch, train_ube=True)

    # Sharded: batch over dp, params replicated.
    bs = shard_batch(mesh, batch)
    br = replicate(mesh, new_agent(cfg, seed=0))
    sr = replicate(mesh, tx.init(br["params"]))
    b2, _, m_shard = step(br, sr, bs, train_ube=True)

    assert float(m_shard["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)
    # Updated parameters agree across the two placements.
    flat1 = jax.tree.leaves(b1["params"])
    flat2 = jax.tree.leaves(b2["params"])
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_sharded_search_runs(mesh):
    from takzero_tpu.search.agents import simple_evaluator
    from takzero_tpu.search.core import make_simulate
    from takzero_tpu.search.openings import make_new_opening
    from takzero_tpu.search.tree import init_tree

    eng = engine(3, half_komi=0)
    evaluator = simple_evaluator(eng)
    simulate = jax.jit(make_simulate(eng, evaluator, max_depth=8))
    envs = make_new_opening(eng)(jax.random.PRNGKey(0), 16)
    tree = init_tree(eng, envs, max_nodes=12, max_children=48)
    tree = shard_batch(mesh, tree)
    for _ in range(8):
        tree = simulate(tree, jnp.zeros(16))
    # Tree stays sharded over dp and the invariants hold.
    root_visits = np.asarray(tree.root_visit)
    assert (root_visits == 8).all()
    sharding = tree.child_visit.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec == P("dp")


def test_sharded_gumbel_move(mesh):
    from takzero_tpu.search.agents import simple_evaluator
    from takzero_tpu.search.gumbel import make_gumbel_search
    from takzero_tpu.search.openings import make_new_opening
    from takzero_tpu.search.policy import slot_action
    from takzero_tpu.search.tree import init_tree

    eng = engine(3, half_komi=0)
    evaluator = simple_evaluator(eng)
    search = jax.jit(make_gumbel_search(eng, evaluator, 4, 16, max_depth=8))
    envs = make_new_opening(eng)(jax.random.PRNGKey(1), 8)
    envs = shard_batch(mesh, envs)
    tree = init_tree(eng, envs, max_nodes=24, max_children=48)
    tree, slot = search(tree, jax.random.PRNGKey(2), jnp.zeros(8))
    acts = np.asarray(slot_action(tree, slot))
    assert (acts >= 0).all()


def test_hash_update_shard_map_keeps_bitset_replicated(mesh):
    """Under shard_map each device sees only its batch shard; hash_update
    must all-gather the indices or the 'replicated' bitset diverges per
    device (and checkpoints silently drop the other shards' bits)."""
    from jax.experimental.shard_map import shard_map

    from takzero_tpu.models.agent import hash_update, new_agent
    from takzero_tpu.ops.repr import state_to_planes
    from takzero_tpu.search.openings import make_new_opening

    cfg = NetConfig(
        n=3, half_komi=0, filters=8, blocks=1, novelty="lcghash", hash_bits=10
    )
    eng = engine(3, half_komi=0)
    envs = jax.jit(
        make_new_opening(eng), static_argnames="batch"
    )(jax.random.PRNGKey(0), 16)
    planes = jax.jit(jax.vmap(lambda s: state_to_planes(eng, s)))(envs)
    bundle = new_agent(cfg, seed=0)

    want = np.asarray(hash_update(cfg, bundle, planes)["hash_bits"])
    assert want.any(), "test batch should set at least one bit"

    f = shard_map(
        lambda b, p: hash_update(cfg, b, p, axis_name="dp")["hash_bits"][None],
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp"),
        check_rep=False,
    )
    per_dev = np.asarray(f(bundle, planes))  # [8, words]
    for d in range(per_dev.shape[0]):
        np.testing.assert_array_equal(per_dev[d], want, err_msg=f"device {d}")
