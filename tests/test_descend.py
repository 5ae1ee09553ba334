"""Tree reuse via host-side re-rooting (reference Node::descend +
tei tree reuse)."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.search.agents import simple_evaluator
from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.tree import descend_host, init_tree
from takzero_tpu.tak import engine, ptn_to_action


def _searched_tree(eng, sims=64):
    simulate, simulate_batch = make_kernels(eng, simple_evaluator(eng), max_depth=16)

    # simulate_batch is ONE virtual-visit round (k forwards share a single
    # NN evaluation), so a lone call only adds one ply below the root —
    # chunk the budget into rounds so the searched tree has real depth.
    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(1))
        left = sims - 1
        while left > 0:
            k = min(16, left)
            tree = simulate_batch(tree, jnp.zeros(1), k)
            left -= k
        return tree

    s = eng.initial()
    for mv in ("a3", "c1"):
        s = eng.step_jit(s, ptn_to_action(eng.n, mv))
    envs = jax.tree.map(lambda x: x[None], s)
    return run(init_tree(eng, envs, 256, 48)), s


def test_descend_preserves_subtree_statistics():
    eng = engine(3)
    tree, state = _searched_tree(eng)
    ca = np.asarray(tree.child_action[0, 0])
    cv = np.asarray(tree.child_visit[0, 0])
    cn = np.asarray(tree.child_node[0, 0])
    # Pick the most-visited expanded child.
    slot = int(np.argmax(np.where(cn >= 0, cv, -1)))
    action = int(ca[slot])
    old_node = int(cn[slot])

    sub = descend_host(tree, action)
    assert sub is not None
    # Root stats equal the old edge stats.
    assert int(sub.root_visit[0]) == int(cv[slot])
    assert float(sub.root_value[0]) == float(tree.child_value[0, 0, slot])
    # Root children equal the old child-node's children.
    np.testing.assert_array_equal(
        np.asarray(sub.child_action[0, 0]),
        np.asarray(tree.child_action[0, old_node]),
    )
    np.testing.assert_array_equal(
        np.asarray(sub.child_visit[0, 0]),
        np.asarray(tree.child_visit[0, old_node]),
    )
    # Root env is the stepped position.
    stepped = eng.step_jit(state, action)
    np.testing.assert_array_equal(
        np.asarray(sub.node_env.height[0, 0]), np.asarray(stepped.height)
    )
    # Node count equals the reachable-subtree size, and further search works.
    k = int(sub.node_count[0])
    assert 1 <= k < int(tree.node_count[0])
    simulate, _ = make_kernels(eng, simple_evaluator(eng), max_depth=16)
    sub2 = jax.jit(simulate)(sub, jnp.zeros(1))
    assert int(sub2.root_visit[0]) == int(sub.root_visit[0]) + 1


def test_descend_unexpanded_child_returns_none():
    eng = engine(3)
    tree, _ = _searched_tree(eng, sims=4)
    ca = np.asarray(tree.child_action[0, 0])
    cn = np.asarray(tree.child_node[0, 0])
    unexpanded = [int(a) for a, n in zip(ca, cn) if a >= 0 and n < 0]
    if unexpanded:  # nearly always true at 4 sims
        assert descend_host(tree, unexpanded[0]) is None
    assert descend_host(tree, 10_000) is None  # action not a child


def test_tei_reuses_tree_across_positions():
    from takzero_tpu.drivers.tei import TeiEngine

    out = io.StringIO()
    e = TeiEngine("tiny3", None, out=out)
    e.handle("tei")
    e.handle("isready")
    e.handle("position startpos moves a3 c1")
    e.handle("go nodes 128 movetime 60000")
    assert e.tree is not None
    visits_before = int(e.tree.root_visit[0])
    assert visits_before >= 128
    # Extend the position by one searched move: tree must descend, not reset.
    best = out.getvalue().splitlines()[-1].split()[-1]
    e.handle(f"position startpos moves a3 c1 {best}")
    assert e.tree is not None
    assert 0 < int(e.tree.root_visit[0]) < visits_before
    # Unrelated position: tree dropped.
    e.handle("position startpos moves b2")
    assert e.tree is None


def test_descend_device_matches_host():
    """Device re-rooting is semantically identical to the host BFS version.

    Interior numbering may differ; equality is pinned on root statistics,
    live-node count, the root child row, and — decisively — on identical
    search behavior afterwards (kernels never depend on pool ordering).
    """
    from takzero_tpu.search.tree import descend_device

    eng = engine(3)
    tree, state = _searched_tree(eng)
    ca = np.asarray(tree.child_action[0, 0])
    cv = np.asarray(tree.child_visit[0, 0])
    cn = np.asarray(tree.child_node[0, 0])
    slot = int(np.argmax(np.where(cn >= 0, cv, -1)))
    action = int(ca[slot])

    host = descend_host(tree, action)
    dev, ok = jax.jit(descend_device)(tree, jnp.int32(action))
    assert bool(ok)
    assert int(dev.node_count[0]) == int(host.node_count[0])
    for f in ("root_visit", "root_flag", "root_ply", "root_value", "root_std"):
        np.testing.assert_allclose(
            np.asarray(getattr(dev, f)), np.asarray(getattr(host, f))
        )
    # Row 0 (the new root) is bit-identical: both numberings start at r.
    for f in ("child_action", "child_visit", "child_flag", "child_value",
              "child_prob", "child_std"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dev, f)[0, 0]), np.asarray(getattr(host, f)[0, 0]),
            err_msg=f,
        )

    # Further search on either tree produces identical root statistics.
    simulate, simulate_batch = make_kernels(
        eng, simple_evaluator(eng), max_depth=16
    )

    @jax.jit
    def more(tree):
        tree = simulate(tree, jnp.zeros(1))
        return simulate_batch(tree, jnp.zeros(1), 15)

    h2, d2 = more(host), more(dev)
    np.testing.assert_allclose(
        np.asarray(h2.root_value), np.asarray(d2.root_value), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(h2.root_visit), np.asarray(d2.root_visit)
    )
    np.testing.assert_array_equal(
        np.asarray(h2.child_visit[0, 0]), np.asarray(d2.child_visit[0, 0])
    )

    # Unexpanded child: ok=False where the host returns None.
    unexp = np.nonzero((ca >= 0) & (cn < 0))[0]
    if len(unexp):
        bad_action = int(ca[int(unexp[0])])
        assert descend_host(tree, bad_action) is None
        _, ok2 = jax.jit(descend_device)(tree, jnp.int32(bad_action))
        assert not bool(ok2)


def test_descend_batch_carries_visits_across_move():
    """[B] trees re-root in lockstep: carried visits/proofs survive a move
    (reference BatchedMCTS::step + Node::descend, batched.rs:131-144)."""
    from takzero_tpu.search.tree import descend_batch, reset_lanes

    eng = engine(3)
    simulate, simulate_batch = make_kernels(
        eng, simple_evaluator(eng), max_depth=16
    )

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(tree.batch_size))
        return simulate_batch(tree, jnp.zeros(tree.batch_size), 47)

    # Three different openings.
    states = []
    for moves in (("a3", "c1"), ("b2",), ("a1", "b1")):
        s = eng.initial()
        for mv in moves:
            s = eng.step_jit(s, ptn_to_action(eng.n, mv))
        states.append(s)
    envs = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    tree = run(init_tree(eng, envs, 256, 48))

    ca = np.asarray(tree.child_action[:, 0])
    cv = np.asarray(tree.child_visit[:, 0])
    cn = np.asarray(tree.child_node[:, 0])
    slots = np.argmax(np.where(cn >= 0, cv, -1), axis=1)

    sub, ok = jax.jit(descend_batch)(tree, jnp.asarray(slots))
    assert bool(np.asarray(ok).all())
    bar = np.arange(3)
    # Root stats carried from the chosen edges, per lane.
    np.testing.assert_array_equal(
        np.asarray(sub.root_visit), cv[bar, slots]
    )
    np.testing.assert_allclose(
        np.asarray(sub.root_value),
        np.asarray(tree.child_value[:, 0])[bar, slots],
    )
    # Row 0 equals each lane's old child-node row.
    for f in ("child_action", "child_visit", "child_flag", "child_value"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sub, f)[bar, 0]),
            np.asarray(getattr(tree, f))[bar, cn[bar, slots]],
            err_msg=f,
        )
    # Root envs are the stepped positions.
    for i in range(3):
        stepped = eng.step_jit(states[i], int(ca[i, slots[i]]))
        np.testing.assert_array_equal(
            np.asarray(sub.node_env.height[i, 0]), np.asarray(stepped.height)
        )
    # Node counts shrink but stay positive; further search works per lane.
    k = np.asarray(sub.node_count)
    assert (k >= 1).all() and (k < np.asarray(tree.node_count)).all()
    sub2 = jax.jit(simulate)(sub, jnp.zeros(3))
    np.testing.assert_array_equal(
        np.asarray(sub2.root_visit), np.asarray(sub.root_visit) + 1
    )

    # A lane pointed at an unexpanded slot reports ok=False and can be
    # reset in place while other lanes keep their subtrees.
    unexp = np.argmax((ca >= 0) & (cn < 0), axis=1)
    if ((ca[bar, unexp] >= 0) & (cn[bar, unexp] < 0)).any():
        mixed = slots.copy()
        lane = int(
            np.argmax((ca[bar, unexp] >= 0) & (cn[bar, unexp] < 0))
        )
        mixed[lane] = unexp[lane]
        sub3, ok3 = jax.jit(descend_batch)(tree, jnp.asarray(mixed))
        ok3 = np.asarray(ok3)
        assert not ok3[lane]
        fresh = reset_lanes(sub3, jnp.asarray(~ok3), envs)
        assert int(fresh.node_count[lane]) == 1


def test_descend_batch_min_headroom_rejects_oversized_subtrees():
    """A lane whose carried subtree would leave fewer than min_headroom
    free pool rows reports ok=False so the caller resets it — with a
    fixed pool, carried subtrees otherwise accumulate across moves until
    mid-search expansion hits the pool-full guard and quality silently
    degrades (the reference heap-allocates, node/mod.rs:95-102)."""
    from takzero_tpu.search.tree import descend_batch

    eng = engine(3)
    tree, _ = _searched_tree(eng)
    cn = np.asarray(tree.child_node[0, 0])
    cv = np.asarray(tree.child_visit[0, 0])
    slot = int(np.argmax(np.where(cn >= 0, cv, -1)))

    sub, ok = jax.jit(descend_batch)(tree, jnp.int32([slot]))
    assert bool(ok[0])
    carried = int(sub.node_count[0])
    assert carried >= 2  # premise: the most-visited child has a subtree

    fits = tree.max_nodes - carried  # largest budget the pool can absorb
    _, ok2 = jax.jit(
        descend_batch, static_argnames="min_headroom"
    )(tree, jnp.int32([slot]), min_headroom=fits)
    assert bool(ok2[0])
    _, ok3 = jax.jit(
        descend_batch, static_argnames="min_headroom"
    )(tree, jnp.int32([slot]), min_headroom=fits + 1)
    assert not bool(ok3[0])
