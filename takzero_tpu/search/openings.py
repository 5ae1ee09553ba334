"""Random opening generation, on device.

Mirrors the reference's `new_opening` (takzero/src/search/env.rs:65-95):
place two flats on either adjacent corners (a1, aN) or opposite corners
(a1, xN), under one of the 8 board symmetries; optionally follow with k
uniformly random plies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..tak.engine import TakEngine
from ..tak.state import initial_state_batch
from ..tak.symmetry import square_maps


def make_new_opening(eng: TakEngine, random_steps: int = 0):
    """Build `new_opening(key, batch) -> TakState` ([B]-leading)."""
    n = eng.n
    sqm = square_maps(n)  # [8, S]
    a1 = 0
    an = (n - 1) * n + 0  # file a, rank N
    xn = (n - 1) * n + (n - 1)
    # openings[pair, position] before symmetry
    pairs = np.array([[a1, an], [a1, xn]], np.int32)
    # first_square[pair, sym], second_square[pair, sym]
    first = sqm[:, pairs[:, 0]].T  # [2, 8]
    second = sqm[:, pairs[:, 1]].T
    step_b = jax.vmap(eng.step)
    legal_b = jax.vmap(eng.legal_mask)
    s = n * n

    def new_opening(key, batch: int):
        k_sym, k_pair, k_steps = jax.random.split(key, 3)
        sym = jax.random.randint(k_sym, (batch,), 0, 8)
        pair = jax.random.randint(k_pair, (batch,), 0, 2)
        sq1 = jnp.asarray(first)[pair, sym]
        sq2 = jnp.asarray(second)[pair, sym]
        envs = initial_state_batch(n, batch)
        envs = step_b(envs, sq1)  # channel 0 = place flat: action == square
        envs = step_b(envs, sq2)

        def random_step(i, envs):
            k_i = jax.random.fold_in(k_steps, i)
            mask = legal_b(envs)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            act = jax.random.categorical(k_i, logits, axis=-1)
            nxt = step_b(envs, act)
            terminal = jax.vmap(eng.terminal_kind)(envs) != 0
            return jax.tree.map(
                lambda nv, old: jnp.where(
                    terminal.reshape((-1,) + (1,) * (old.ndim - 1)), old, nv
                ),
                nxt,
                envs,
            )

        if random_steps:
            envs = jax.lax.fori_loop(0, random_steps, random_step, envs)
        return envs

    return new_opening
