"""Wavefront serve-path kernel (search/serve.py).

serve_chunk pipelines K descents as a stagger-1 wavefront; its visit
accounting is exactly sequential-equivalent to simulate_batch (until
in-chunk proofs occur, which simulate_batch backs up mid-chunk), so on
proof-free positions the two kernels must produce identical visit
distributions and expansion sets.  It must also still prove tinues.
Mirrors the reference serve path (mcts.rs:268-328, tei/src/main.rs:251-296).
"""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.search.agents import dummy_evaluator
from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.serve import make_serve_chunk
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine, ptn_to_action


def _root_env(eng, moves, batch=1):
    s = eng.initial()
    for m in moves:
        s = eng.step_jit(s, ptn_to_action(eng.n, m))
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)


def test_visit_accounting_and_expansion():
    eng = engine(3)
    simulate, _ = make_kernels(eng, dummy_evaluator(eng), max_depth=16)
    serve = make_serve_chunk(eng, dummy_evaluator(eng), 15, max_depth=16)

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(2))
        return serve(tree, jnp.zeros(2))

    envs = _root_env(eng, ["a3", "c1"], batch=2)
    tree = init_tree(eng, envs, max_nodes=32, max_children=48)
    tree = run(tree)
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
    # Multiple distinct nodes expanded (the stagger decorrelates paths).
    assert (np.asarray(tree.node_count) > 2).all()


def test_matches_simulate_batch_on_proof_free_position():
    """On a 5x5 opening (no terminal reachable in 15 shallow sims) the
    wavefront schedule is exactly sequential-equivalent: identical visit
    counts, expansion sets, and (to float tolerance) values."""
    eng = engine(5)
    simulate, simulate_batch = make_kernels(eng, dummy_evaluator(eng), max_depth=16)
    serve = make_serve_chunk(eng, dummy_evaluator(eng), 15, max_depth=16)

    envs = _root_env(eng, ["a5", "e1"], batch=1)
    t0 = init_tree(eng, envs, max_nodes=32, max_children=64)

    ref = jax.jit(lambda t: simulate_batch(simulate(t, jnp.zeros(1)), jnp.zeros(1), 15))(t0)
    got = jax.jit(lambda t: serve(simulate(t, jnp.zeros(1)), jnp.zeros(1)))(t0)

    np.testing.assert_array_equal(np.asarray(got.root_visit), np.asarray(ref.root_visit))
    np.testing.assert_array_equal(np.asarray(got.node_count), np.asarray(ref.node_count))
    np.testing.assert_array_equal(
        np.asarray(got.child_visit[:, :-1]), np.asarray(ref.child_visit[:, :-1])
    )
    np.testing.assert_array_equal(
        np.asarray(got.child_action[:, :-1]), np.asarray(ref.child_action[:, :-1])
    )
    np.testing.assert_array_equal(
        np.asarray(got.child_node[:, :-1]), np.asarray(ref.child_node[:, :-1])
    )
    np.testing.assert_allclose(
        np.asarray(got.root_value), np.asarray(ref.root_value), atol=1e-5
    )
    valid = np.asarray(ref.child_action[:, :-1]) >= 0
    np.testing.assert_allclose(
        np.asarray(got.child_value[:, :-1])[valid],
        np.asarray(ref.child_value[:, :-1])[valid],
        atol=1e-5,
    )


def test_batched_sims_spread_over_children():
    eng = engine(3)
    simulate, _ = make_kernels(eng, dummy_evaluator(eng), max_depth=16)
    serve = make_serve_chunk(eng, dummy_evaluator(eng), 31, max_depth=16)

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(1))
        return serve(tree, jnp.zeros(1))

    envs = _root_env(eng, ["a3", "c1"], batch=1)
    tree = run(init_tree(eng, envs, max_nodes=48, max_children=48))
    visits = np.asarray(tree.child_visit[0, 0])
    valid = np.asarray(tree.child_action[0, 0]) >= 0
    visited_children = int((visits[valid] > 0).sum())
    assert visited_children >= 8, visits[valid]


def test_serve_proves_tinue():
    eng = engine(3)
    simulate, _ = make_kernels(eng, dummy_evaluator(eng), max_depth=32)
    serve = make_serve_chunk(eng, dummy_evaluator(eng), 63, max_depth=32)

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.ones(1))
        return serve(tree, jnp.ones(1))

    envs = _root_env(eng, ["a3", "c1", "c2", "c3", "b3", "c3-"], batch=1)
    tree = init_tree(eng, envs, max_nodes=1600, max_children=64)
    for _ in range(24):
        tree = run(tree)
        if int(tree.root_flag[0]) == ev.WIN:
            break
    assert int(tree.root_flag[0]) == ev.WIN
    acts = np.asarray(tree.child_action[0, 0])
    flags = np.asarray(tree.child_flag[0, 0])
    losing = {int(a) for a, f in zip(acts, flags) if a >= 0 and f == ev.LOSS}
    assert ptn_to_action(3, "b1") in losing


def test_unexpanded_root_is_noop():
    """A lane whose root was never expanded (e.g. a terminal position —
    `go` before any plain simulate) must not fabricate leaves: no visit,
    node, or edge writes."""
    eng = engine(3)
    serve = jax.jit(make_serve_chunk(eng, dummy_evaluator(eng), 7, max_depth=16))
    envs = _root_env(eng, ["a3", "c1"], batch=2)
    tree = init_tree(eng, envs, max_nodes=32, max_children=48)
    out = serve(tree, jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(out.root_visit), np.asarray(tree.root_visit))
    np.testing.assert_array_equal(np.asarray(out.node_count), np.asarray(tree.node_count))
    np.testing.assert_array_equal(np.asarray(out.overflow), np.asarray(tree.overflow))
    # Real (non-scratch) rows untouched.
    np.testing.assert_array_equal(
        np.asarray(out.child_action[:, :-1]), np.asarray(tree.child_action[:, :-1])
    )
    np.testing.assert_array_equal(
        np.asarray(out.child_visit[:, :-1]), np.asarray(tree.child_visit[:, :-1])
    )
