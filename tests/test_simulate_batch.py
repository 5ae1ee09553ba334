"""Virtual-visit batched simulation (serve-path kernel, mcts.rs:268-328).

simulate_batch collects K leaves per network call on the same tree; it
must preserve the visit-accounting invariants and still let the exact
solver prove tinues.
"""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.search.agents import dummy_evaluator, simple_evaluator
from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine, ptn_to_action


def _root_env(eng, moves, batch=1):
    s = eng.initial()
    for m in moves:
        s = eng.step_jit(s, ptn_to_action(eng.n, m))
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)


def test_visit_accounting_and_expansion():
    eng = engine(3)
    simulate, simulate_batch = make_kernels(eng, dummy_evaluator(eng), max_depth=16)

    @jax.jit
    def run(tree, k):
        tree = simulate(tree, jnp.zeros(2))
        return simulate_batch(tree, jnp.zeros(2), 15)

    envs = _root_env(eng, ["a3", "c1"], batch=2)
    tree = init_tree(eng, envs, max_nodes=32, max_children=48)
    tree = run(tree, 15)
    rv = np.asarray(tree.root_visit)
    np.testing.assert_array_equal(rv, [16, 16])
    # Root visit = sum of child visits + 1 (root expansion sim).
    cv = np.asarray(
        jnp.sum(
            jnp.where(tree.child_action[:, 0, :] >= 0, tree.child_visit[:, 0, :], 0),
            axis=-1,
        )
    )
    np.testing.assert_array_equal(rv, cv + 1)
    # Multiple distinct nodes expanded (virtual visits decorrelate paths).
    assert (np.asarray(tree.node_count) > 2).all()


def test_batched_sims_spread_over_children():
    """With a uniform agent, 31 batched sims must not all pile onto one
    child (the in-forward visit increments must decorrelate descents)."""
    eng = engine(3)
    simulate, simulate_batch = make_kernels(eng, dummy_evaluator(eng), max_depth=16)

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(1))
        return simulate_batch(tree, jnp.zeros(1), 31)

    envs = _root_env(eng, ["a3", "c1"], batch=1)
    tree = run(init_tree(eng, envs, max_nodes=48, max_children=48))
    visits = np.asarray(tree.child_visit[0, 0])
    valid = np.asarray(tree.child_action[0, 0]) >= 0
    visited_children = int((visits[valid] > 0).sum())
    assert visited_children >= 8, visits[valid]


def test_simulate_batch_proves_tinue():
    eng = engine(3)
    simulate, simulate_batch = make_kernels(eng, dummy_evaluator(eng), max_depth=32)

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.ones(1))
        return simulate_batch(tree, jnp.ones(1), 63)

    envs = _root_env(eng, ["a3", "c1", "c2", "c3", "b3", "c3-"], batch=1)
    tree = init_tree(eng, envs, max_nodes=1600, max_children=64)
    for _ in range(24):
        tree = run(tree)
        if int(tree.root_flag[0]) == ev.WIN:
            break
    assert int(tree.root_flag[0]) == ev.WIN
    # The proving reply b1 is marked a loss for the opponent.
    acts = np.asarray(tree.child_action[0, 0])
    flags = np.asarray(tree.child_flag[0, 0])
    losing = {int(a) for a, f in zip(acts, flags) if a >= 0 and f == ev.LOSS}
    assert ptn_to_action(3, "b1") in losing
