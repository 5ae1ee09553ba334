"""Device-resident bitsets with scatter-OR, for novelty hash sets.

The reference keeps a 2^32-bit host bitvec (512 MiB) for SimHash/LCG
novelty (net4_simhash.rs:134-190).  Here the set lives in HBM as
uint32[2^bits / 32] and is updated on device — no host round trips in the
search or train hot paths.

XLA has no scatter-OR, so updates deduplicate indices (sort + neighbor
mask), drop already-set bits, and scatter-add the resulting powers of two
— exact and race-free within a jit.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def bitset_init(bits: int) -> jnp.ndarray:
    assert bits >= 5
    return jnp.zeros((1 << (bits - 5),), U32)


def bitset_query(bitset: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """bool[K]: is bit `idx` set."""
    idx = idx.astype(U32)
    word = (idx >> 5).astype(jnp.int32)
    bit = idx & U32(31)
    return ((bitset[word] >> bit) & U32(1)) != 0


def bitset_set(bitset: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Set bits `idx` (uint32[K]); returns the new bitset."""
    idx = idx.astype(U32)
    order = jnp.argsort(idx)
    sidx = idx[order]
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), sidx[1:] == sidx[:-1]]
    )
    word = (sidx >> 5).astype(jnp.int32)
    bit = sidx & U32(31)
    val = U32(1) << bit
    already = ((bitset[word] >> bit) & U32(1)) != 0
    add = jnp.where(dup | already, U32(0), val)
    return bitset.at[word].add(add)
