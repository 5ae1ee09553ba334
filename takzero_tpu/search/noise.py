"""Dirichlet exploration noise on the root policy.

Mirrors the reference (takzero/src/search/node/noise.rs:10-26): mix each
root child's probability with a Dirichlet(alpha) sample at `ratio`
(p' = (1-ratio)*p + ratio*d) and recompute the stored logits as ln(p')
so downstream PUCT / improved-policy formulas see a consistent policy.

The reference declares this but its selfplay currently uses Gumbel root
sampling instead (selfplay/src/main.rs:127-136 commented); we keep it as
an available root-exploration alternative, vectorized over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tree import Tree


def apply_dirichlet(tree: Tree, key, alpha: float, ratio: float) -> Tree:
    """Mix Dirichlet(alpha) noise into every root child slot's probability.

    Invalid slots (action < 0) keep probability 0; the Dirichlet sample is
    drawn over valid slots only so the mixed distribution still sums to 1.
    """
    prob = tree.child_prob[:, 0, :]
    valid = tree.child_action[:, 0, :] >= 0
    b, c = prob.shape
    # Dirichlet over the valid support: Gamma(alpha) per slot, zeroed on
    # invalid slots, normalized per row.
    g = jax.random.gamma(key, jnp.float32(alpha), shape=(b, c))
    g = jnp.where(valid, g, 0.0)
    d = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
    mixed = (1.0 - ratio) * prob + ratio * d
    mixed = jnp.where(valid, mixed, 0.0)
    logit = jnp.where(valid, jnp.log(jnp.maximum(mixed, 1e-30)), 0.0)
    return tree._replace(
        child_prob=tree.child_prob.at[:, 0, :].set(mixed),
        child_logit=tree.child_logit.at[:, 0, :].set(logit),
    )
