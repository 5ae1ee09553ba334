"""Batched evaluators: ``envs -> (policy_logits [B,A], value [B], var [B])``.

The test/baseline agents mirror the reference fixtures
(takzero/src/search/agent.rs): `Dummy` (uniform logits, value 0) and
`Simple` (piece-type logits, flat-count-difference value).  Network agents
are built in models/agent.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..tak.engine import TakEngine


def dummy_evaluator(eng: TakEngine):
    """Uniform policy, zero value/uncertainty (agent.rs:16-42)."""
    a = eng.num_actions

    def evaluate(envs):
        b = envs.ply.shape[0]
        zeros = jnp.zeros((b,), jnp.float32)
        return jnp.ones((b, a), jnp.float32), zeros, zeros

    return evaluate


def simple_evaluator(eng: TakEngine):
    """Piece-type-weighted policy + flat-diff value (agent.rs:44-87).

    Logits: flat placement 4, cap 3, wall 2, spreads 1.  Value:
    (flat_diff - half_komi/2) / N^2 from the mover's perspective (the /2 is
    integer division, as in the reference).
    """
    sp = eng.space
    s = sp.num_squares
    per_channel = np.ones(sp.num_channels, np.float32)
    per_channel[0] = 4.0
    per_channel[2] = 3.0
    per_channel[1] = 2.0
    logits_np = np.repeat(per_channel, s)
    komi_half = int(np.trunc(eng.half_komi / 2))

    flat_diff = jax.vmap(eng.flat_diff)

    def evaluate(envs):
        b = envs.ply.shape[0]
        logits = jnp.broadcast_to(jnp.asarray(logits_np), (b, sp.num_actions))
        fcd = (flat_diff(envs).astype(jnp.float32) - komi_half) / s
        value = jnp.where(envs.to_move == 1, -fcd, fcd)
        return logits, value, jnp.zeros((b,), jnp.float32)

    return evaluate
