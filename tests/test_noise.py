"""Dirichlet root noise invariants (reference noise.rs:48-67)."""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search.agents import simple_evaluator
from takzero_tpu.search.core import make_simulate
from takzero_tpu.search.noise import apply_dirichlet
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine


def _expanded_tree():
    eng = engine(3)
    evaluator = simple_evaluator(eng)
    simulate = jax.jit(make_simulate(eng, evaluator, max_depth=8))
    envs = make_new_opening(eng)(jax.random.PRNGKey(0), 4)
    tree = init_tree(eng, envs, max_nodes=8, max_children=48)
    return simulate(tree, jnp.zeros(4))


def test_distribution_stays_1_after_noise():
    tree = _expanded_tree()
    valid = np.asarray(tree.child_action[:, 0, :] >= 0)
    before = np.asarray(tree.child_prob[:, 0, :])
    np.testing.assert_allclose(before.sum(-1), 1.0, atol=1e-5)

    noised = apply_dirichlet(tree, jax.random.PRNGKey(7), alpha=0.3, ratio=0.25)
    after = np.asarray(noised.child_prob[:, 0, :])
    # Still a distribution over the same support.
    np.testing.assert_allclose(after.sum(-1), 1.0, atol=1e-5)
    assert (after[~valid] == 0).all()
    assert (after[valid] >= 0).all()
    # Noise actually moved mass.
    assert np.abs(after - before).max() > 1e-6
    # Logits consistent with the mixed probabilities.
    logits = np.asarray(noised.child_logit[:, 0, :])
    np.testing.assert_allclose(
        np.where(valid, np.exp(logits), 0.0), after, atol=1e-5
    )


def test_ratio_zero_is_identity():
    tree = _expanded_tree()
    noised = apply_dirichlet(tree, jax.random.PRNGKey(3), alpha=0.5, ratio=0.0)
    np.testing.assert_allclose(
        np.asarray(noised.child_prob[:, 0, :]),
        np.asarray(tree.child_prob[:, 0, :]),
        atol=1e-6,
    )
