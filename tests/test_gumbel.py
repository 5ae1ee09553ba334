"""Gumbel sequential-halving search tests (tiny configs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.search.agents import simple_evaluator
from takzero_tpu.search.core import make_simulate
from takzero_tpu.search.gumbel import make_gumbel_search, sh_schedule
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.search.policy import (
    improved_policy,
    select_best_slot,
    slot_action,
    ube_target,
)
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine


def test_sh_schedule_reference_config():
    # Reference selfplay config: k=64, budget=768 -> 6 phases, visits/phase
    # 128, per-action visits 2,4,8,16,32,64 (selfplay/src/main.rs:45-52).
    ranks, alive, halve, cums = sh_schedule(64, 768)
    assert len(ranks) == 768
    assert halve.sum() == 6
    assert cums[halve].tolist() == [2, 6, 14, 30, 62, 126]
    # IMPROVED_POLICY_VISITATIONS == final cumulative visits == 126.


def test_gumbel_search_runs_and_solves():
    eng = engine(3)
    evaluator = simple_evaluator(eng)
    search = jax.jit(make_gumbel_search(eng, evaluator, 4, 16, max_depth=16))
    opening = make_new_opening(eng)
    envs = opening(jax.random.PRNGKey(0), 4)
    tree = init_tree(eng, envs, max_nodes=24, max_children=48)
    tree, slot = search(tree, jax.random.PRNGKey(1), jnp.zeros(4))

    acts = np.asarray(slot_action(tree, slot))
    valid = np.asarray(tree.child_action[:, 0, :] >= 0)
    assert (acts >= 0).all()
    # Root visit = sum of child visits + 1.
    rv = np.asarray(tree.root_visit)
    cv = np.asarray(jnp.sum(jnp.where(tree.child_action[:, 0, :] >= 0,
                                      tree.child_visit[:, 0, :], 0), axis=-1))
    np.testing.assert_array_equal(rv, cv + 1)
    assert valid.any(axis=-1).all()

    # Improved policy sums to 1 over valid slots.
    pi = np.asarray(improved_policy(tree, 126.0))
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-5)
    assert (pi[~valid] == 0).all()

    # UBE target finite and in [0, 4].
    u = np.asarray(ube_target(tree, 0.25))
    assert (u >= 0).all()

    best = np.asarray(select_best_slot(tree))
    assert (best >= 0).all()


def test_gumbel_budget_only_visits_selected():
    # With k=2 and a huge branching factor, only sampled actions get visits.
    eng = engine(4)
    evaluator = simple_evaluator(eng)
    search = jax.jit(make_gumbel_search(eng, evaluator, 2, 8, max_depth=16))
    opening = make_new_opening(eng)
    envs = opening(jax.random.PRNGKey(3), 2)
    tree = init_tree(eng, envs, max_nodes=16, max_children=64)
    tree, _ = search(tree, jax.random.PRNGKey(4), jnp.zeros(2))
    visits = np.asarray(tree.child_visit[:, 0, :])
    # 8 budget split over at most 2 actions; at most 2 slots visited.
    assert ((visits > 0).sum(-1) <= 2).all()
    assert visits.sum(-1).max() == 8
