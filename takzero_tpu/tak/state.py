"""Fixed-shape Tak board state as a JAX pytree.

Stack composition is a 64-bit color bitfield split into two uint32 lanes
(TPUs have no fast int64): bit ``h`` of ``(owner_lo, owner_hi)`` is the color
(0=white, 1=black) of the piece at height ``h``.  Only the top piece can be a
wall or capstone, so a single ``tops`` plane carries piece type.

This replaces the reference's external bitboard crate (fast-tak, see
SURVEY.md §2.4) with a shape-static, vmappable representation.  Max stack
height is 64, which is exact for board sizes 3-6 (total pieces <= 62); at
7x7/8x8 pathological stacks above 64 pieces would overflow — the same
tradeoff as fast-tak's u64 ``Stack`` bitfield, and unreachable in
practical play (fuzzed vs the unbounded C++ oracle in
tests/test_oracle_fuzz.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .moves import DEFAULT_RESERVES


class TakState(NamedTuple):
    height: jnp.ndarray  # int32[S]
    owner_lo: jnp.ndarray  # uint32[S] color bits for heights 0..31
    owner_hi: jnp.ndarray  # uint32[S] color bits for heights 32..63
    tops: jnp.ndarray  # int32[S] 0 empty / 1 flat / 2 wall / 3 cap
    reserves: jnp.ndarray  # int32[2, 2] [player][0=stones, 1=caps]
    to_move: jnp.ndarray  # int32[] 0 white / 1 black
    ply: jnp.ndarray  # int32[]
    reversible: jnp.ndarray  # int32[] consecutive non-crush spreads


def initial_state(n: int) -> TakState:
    s = n * n
    stones, caps = DEFAULT_RESERVES[n]
    return TakState(
        height=jnp.zeros((s,), jnp.int32),
        owner_lo=jnp.zeros((s,), jnp.uint32),
        owner_hi=jnp.zeros((s,), jnp.uint32),
        tops=jnp.zeros((s,), jnp.int32),
        reserves=jnp.array([[stones, caps], [stones, caps]], jnp.int32),
        to_move=jnp.int32(0),
        ply=jnp.int32(0),
        reversible=jnp.int32(0),
    )


def initial_state_batch(n: int, batch: int) -> TakState:
    one = initial_state(n)
    return TakState(*(jnp.broadcast_to(x, (batch,) + x.shape) for x in one))


def state_equal(a: TakState, b: TakState) -> bool:
    """Host-side structural equality (ignores the reversible counter)."""
    for name in ("height", "owner_lo", "owner_hi", "tops", "reserves", "to_move", "ply"):
        if not np.array_equal(np.asarray(getattr(a, name)), np.asarray(getattr(b, name))):
            return False
    return True
