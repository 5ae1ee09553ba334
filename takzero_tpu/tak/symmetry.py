"""Board symmetries (D4) for states and action indices.

The reference gets 8-fold symmetries from fast-tak (used for opening
generation, env.rs:65-79, and target augmentation, target.rs:37-54).  Here:
symmetry ``t = k + 4*m`` applies ``rot90^k`` then ``mirror^m`` where
rot90(r, c) = (c, n-1-r) and mirror(r, c) = (r, n-1-c).  Identity is t=0.

Provides numpy tables: square permutations [8, S] and action-index maps
[8, A] (placement channels keep their channel; spread directions are
remapped by transforming the direction vector; patterns are unchanged).
"""

from __future__ import annotations

import functools

import numpy as np

from .moves import DIR_DELTAS, action_space


def transform_rc(t: int, r: int, c: int, n: int) -> tuple[int, int]:
    for _ in range(t & 3):
        r, c = c, n - 1 - r
    if t >= 4:
        c = n - 1 - c
    return r, c


@functools.lru_cache(maxsize=None)
def square_maps(n: int) -> np.ndarray:
    """[8, S] array: new square index of old square sq under symmetry t."""
    out = np.zeros((8, n * n), np.int32)
    for t in range(8):
        for r in range(n):
            for c in range(n):
                rr, cc = transform_rc(t, r, c, n)
                out[t, r * n + c] = rr * n + cc
    return out


@functools.lru_cache(maxsize=None)
def direction_maps(n: int) -> np.ndarray:
    """[8, 4]: new direction id of old direction under symmetry t."""
    out = np.zeros((8, 4), np.int32)
    deltas = [tuple(d) for d in DIR_DELTAS.tolist()]
    for t in range(8):
        for d, (dr, dc) in enumerate(deltas):
            # Transform two points and take the difference.
            r0, c0 = transform_rc(t, 0, 0, 3)
            r1, c1 = transform_rc(t, dr, dc, 3)
            nd = (r1 - r0, c1 - c0)
            out[t, d] = deltas.index(nd)
    return out


@functools.lru_cache(maxsize=None)
def action_maps(n: int) -> np.ndarray:
    """[8, A]: new action index of old action under symmetry t."""
    sp = action_space(n)
    s = n * n
    sqm = square_maps(n)
    dirm = direction_maps(n)
    out = np.zeros((8, sp.num_actions), np.int32)
    for t in range(8):
        for ch in range(sp.num_channels):
            if ch < 3:
                new_ch = np.full(s, ch, np.int32)
            else:
                si = ch - 3
                d = int(sp.spread_dir[si])
                pattern = si % sp.num_patterns
                nd = int(dirm[t, d])
                new_ch = np.full(s, 3 + nd * sp.num_patterns + pattern, np.int32)
            for sq in range(s):
                out[t, ch * s + sq] = new_ch[sq] * s + sqm[t, sq]
    return out


def transform_state_np(n: int, state, t: int):
    """Apply symmetry t to a host-side TakState (numpy arrays)."""
    perm = square_maps(n)[t]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))

    def move(x):
        return np.asarray(x)[inv]

    return state._replace(
        height=move(state.height),
        owner_lo=move(state.owner_lo),
        owner_hi=move(state.owner_hi),
        tops=move(state.tops),
    )
