"""Batched MCTS + exact solver tests.

Ports the reference's search-correctness strategy (mcts.rs:345-445): the
solver must *prove* wins on known 3x3 tactics and identify the winning
move, using only the Dummy/Simple agents.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.search.agents import dummy_evaluator, simple_evaluator
from takzero_tpu.search.core import make_simulate
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine, ptn_to_action


def build_root_env(eng, moves, batch=1):
    s = eng.initial()
    for m in moves:
        s = eng.step_jit(s, ptn_to_action(eng.n, m))
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)


@functools.lru_cache(maxsize=None)
def runner(n, agent_name, beta, max_nodes, max_children, chunk):
    eng = engine(n)
    evaluator = {"dummy": dummy_evaluator, "simple": simple_evaluator}[agent_name](eng)
    simulate = make_simulate(eng, evaluator, max_depth=32)

    @jax.jit
    def run(tree):
        def body(_, t):
            return simulate(t, beta)

        return jax.lax.fori_loop(0, chunk, body, tree)

    return eng, run


def solve(eng, run, root_env, max_nodes, max_children, max_chunks):
    tree = init_tree(eng, root_env, max_nodes, max_children)
    for _ in range(max_chunks):
        tree = run(tree)
        if bool((tree.root_flag == ev.WIN).all()):
            return tree
    return tree


def losing_children(eng, tree, b=0):
    del eng
    acts = np.asarray(tree.child_action[b, 0])
    flags = np.asarray(tree.child_flag[b, 0])
    return {int(a) for a, f in zip(acts, flags) if a >= 0 and f == ev.LOSS}


def test_find_tinue_easy():
    # Reference mcts.rs:345-376: after a3 c1 c2 c3 b3 c3-, white wins; the
    # proving move is b1.
    eng, run = runner(3, "dummy", 1.0, 1600, 64, 256)
    root = build_root_env(eng, ["a3", "c1", "c2", "c3", "b3", "c3-"], batch=2)
    tree = solve(eng, run, root, 1600, 64, 6)
    assert np.asarray(tree.root_flag).tolist() == [ev.WIN, ev.WIN]
    losing = losing_children(eng, tree, b=0)
    assert ptn_to_action(3, "b1") in losing


def test_find_tinue_deeper():
    # Reference mcts.rs:379-411: after a3 a1 b1 c1, white wins via b2 or c2.
    eng, run = runner(3, "simple", 1.0, 12000, 64, 2048)
    root = build_root_env(eng, ["a3", "a1", "b1", "c1"], batch=1)
    tree = solve(eng, run, root, 12000, 64, 12)
    assert int(tree.root_flag[0]) == ev.WIN
    losing = losing_children(eng, tree, b=0)
    expected = {ptn_to_action(3, "b2"), ptn_to_action(3, "c2")}
    assert losing & expected, f"losing={losing}"


def test_value_propagation_sign():
    # A won-in-1 position must back a positive value/proof to the root.
    eng, run = runner(3, "dummy", 0.0, 400, 64, 64)
    # White has b1, b2; b3 wins. Black stones on a-file corners via swap.
    root = build_root_env(eng, ["a3", "c3", "b1", "a1", "b2"], batch=1)
    # It's black to move; black is lost here? Not necessarily terminal-fast;
    # instead check the solver from white's winning side:
    root = build_root_env(eng, ["a3", "c3", "b1", "a1", "b2", "c2"], batch=1)
    tree = solve(eng, run, root, 400, 64, 4)
    assert int(tree.root_flag[0]) == ev.WIN
    assert int(tree.root_ply[0]) == 1  # win in one ply


def test_truncation_stats():
    """truncation_stats counts allocated incomplete nodes only — the root
    with 9 legal placements is incomplete at C=4 and complete at C=16
    (search/tree.py truncation semantics; VERDICT child-truncation gap)."""
    from takzero_tpu.search.tree import truncation_stats

    eng, run = runner(3, "dummy", 0.0, 40, 4, 8)
    root = build_root_env(eng, [], batch=2)
    tree = run(init_tree(eng, root, 40, 4))
    st = np.asarray(truncation_stats(tree))
    assert st.shape == (2, 2)
    nodes = np.asarray(tree.node_count)
    np.testing.assert_array_equal(st[:, 0], nodes)
    # Root (9 placements > 4 slots) is incomplete in every lane.
    assert (st[:, 1] >= 1).all()
    assert (st[:, 1] <= st[:, 0]).all()

    eng, run = runner(3, "dummy", 0.0, 40, 16, 8)
    tree = run(init_tree(eng, root, 40, 16))
    st = np.asarray(truncation_stats(tree))
    # 3x3 branching never exceeds 16 in the first few plies.
    assert (st[:, 1] == 0).all()


def test_uct_scores_reference_formula():
    """uct_scores mirrors select_with_uct (policy.rs:104-117,158-164):
    q + sqrt(ln(N)/n) + beta*std, win-children pruned."""
    import jax.numpy as jnp
    from takzero_tpu.search.policy import uct_scores
    from takzero_tpu.search.tree import init_tree
    from takzero_tpu.search.openings import make_new_opening

    eng = engine(3)
    envs = make_new_opening(eng)(jax.random.PRNGKey(0), 1)
    tree = init_tree(eng, envs, max_nodes=8, max_children=48)
    tree = tree._replace(
        child_action=tree.child_action.at[0, 0, 0].set(5)
        .at[0, 0, 1].set(6),
        child_visit=tree.child_visit.at[0, 0, 0].set(4).at[0, 0, 1].set(1),
        child_value=tree.child_value.at[0, 0, 0].set(0.25),
        child_flag=tree.child_flag.at[0, 0, 1].set(ev.WIN),
        child_ply=tree.child_ply.at[0, 0, 1].set(1),
    )
    s = np.asarray(uct_scores(tree, jnp.asarray([5.0]), 0.0))[0]
    # Slot 0: q = -0.25 (negated), u = sqrt(ln 5 / 4).
    np.testing.assert_allclose(
        s[0], -0.25 + np.sqrt(np.log(5.0) / 4.0), rtol=1e-6
    )
    assert s[1] == -np.inf  # win child pruned (root not a proven loss)
    assert (s[2:] == -np.inf).all()  # invalid slots
