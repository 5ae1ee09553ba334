"""Elementwise 64-bit bitfield helpers on (lo, hi) uint32 lane pairs.

TPUs have no fast 64-bit integers, so stack color bitfields are stored as two
uint32 lanes.  All helpers are elementwise and shape-polymorphic (work on
scalars or arrays) and are safe for shift amounts in [0, 63].
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _u(x):
    return jnp.asarray(x).astype(_U32)


def shr64(lo, hi, s):
    """Logical right shift of the 64-bit value (lo, hi) by s in [0, 63]."""
    s = _u(s)
    t = s & 31
    hi_part = jnp.where(t > 0, hi << ((32 - t) & 31), _U32(0))
    lo_small = (lo >> t) | hi_part
    hi_small = hi >> t
    big = s >= 32
    return jnp.where(big, hi >> t, lo_small), jnp.where(big, _U32(0), hi_small)


def shl64(lo, hi, s):
    """Logical left shift of the 64-bit value (lo, hi) by s in [0, 63]."""
    s = _u(s)
    t = s & 31
    lo_part = jnp.where(t > 0, lo >> ((32 - t) & 31), _U32(0))
    lo_small = lo << t
    hi_small = (hi << t) | lo_part
    big = s >= 32
    return jnp.where(big, _U32(0), lo_small), jnp.where(big, lo << t, hi_small)


def low_mask64(count):
    """64-bit mask with the low `count` bits set, count in [0, 64]."""
    count = _u(count)
    lo = jnp.where(count >= 32, ~_U32(0), (_U32(1) << (count & 31)) - 1)
    hi_n = count - 32
    hi = jnp.where(count >= 32, (_U32(1) << (hi_n & 31)) - 1, _U32(0))
    hi = jnp.where(count >= 64, ~_U32(0), hi)
    return lo, hi


def extract_bits(lo, hi, start, count_mask):
    """Extract bits [start, start+count) as a uint32 (count <= 32).

    `count_mask` must be the uint32 mask ``(1 << count) - 1``.
    """
    v_lo, _ = shr64(lo, hi, start)
    return v_lo & _u(count_mask)


def get_bit(lo, hi, pos):
    """Bit at position pos (uint32 0/1)."""
    v_lo, _ = shr64(lo, hi, pos)
    return v_lo & _U32(1)


def insert_bits(lo, hi, value, pos):
    """OR `value` (uint32) shifted to bit position pos into (lo, hi)."""
    add_lo, add_hi = shl64(_u(value), _U32(0), pos)
    return lo | add_lo, hi | add_hi
