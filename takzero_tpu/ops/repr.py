"""On-device NN input encoding of Tak states.

Produces the reference's input-plane layout (takzero/src/network/repr.rs:
135-228) directly from :class:`TakState` arrays — no host round trip:

* per side, "mine" (side to move) first: top-piece one-hots (flat/wall/cap)
  then 2N "carry" planes: is the piece at depth d below the top mine/theirs
  (d = 1..2N);
* reserve ratio planes (my stones, my caps, opp stones, opp caps);
* side-to-move plane (1s when black to move);
* flat-count-difference plane: (white_flats - black_flats - half_komi/2)/N²
  — always from white's perspective (verified against repr.rs golden tests).

Output is [C, N, N] float32 (channel-major to match the reference layout;
models transpose to NHWC internally).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..tak import bits
from ..tak.engine import TakEngine
from ..tak.moves import DEFAULT_RESERVES


def stack_size(n: int) -> int:
    return 2 * n + 3


def input_channels(n: int) -> int:
    return 2 * (stack_size(n) + 2) + 2


def input_size(n: int) -> int:
    return input_channels(n) * n * n


def state_to_planes(eng: TakEngine, state) -> jnp.ndarray:
    """Encode one state as [input_channels, N, N] float32. vmap for batches."""
    n = eng.n
    ss = stack_size(n)
    me = state.to_move
    h = state.height
    tc = eng.top_color(state)  # int32[S], 0 where empty

    def side_planes(color):
        top = [
            ((state.tops == j + 1) & (tc == color) & (h > 0)).astype(jnp.float32)
            for j in range(3)
        ]
        carry = []
        for i in range(ss - 3):  # depth below top = i + 1
            depth = i + 1
            exists = h > depth
            pos = jnp.maximum(h - 1 - depth, 0)
            col = bits.get_bit(state.owner_lo, state.owner_hi, pos).astype(jnp.int32)
            carry.append((exists & (col == color)).astype(jnp.float32))
        return top + carry

    mine = side_planes(me)
    opp = side_planes(1 - me)

    default_stones, default_caps = DEFAULT_RESERVES[n]
    res = state.reserves.astype(jnp.float32)
    stones_ratio = res[:, 0] / default_stones
    caps_ratio = res[:, 1] / default_caps if default_caps else jnp.zeros(2)
    s = n * n
    ones = jnp.ones((s,), jnp.float32)
    reserve_planes = [
        ones * stones_ratio[me],
        ones * caps_ratio[me],
        ones * stones_ratio[1 - me],
        ones * caps_ratio[1 - me],
    ]
    to_move_plane = ones * (me == 1)

    fcd = eng.flat_diff(state).astype(jnp.float32) - eng.half_komi / 2.0
    fcd_plane = ones * (fcd / s)

    planes = jnp.stack(mine + opp + reserve_planes + [to_move_plane, fcd_plane])
    return planes.reshape(input_channels(n), n, n)


@functools.lru_cache(maxsize=None)
def batch_planes_fn(eng: TakEngine):
    """Jitted batched encoder: TakState SoA [B, ...] -> planes [B, C, N, N].

    Cache holds compiled callables only (never device arrays — see
    CLAUDE.md gotcha); `engine()` instances are lru-cached singletons so
    the key is stable.  Eager `jax.vmap(state_to_planes)` executes one
    primitive per dispatch — on a remote accelerator that is dozens of
    round trips per batch, which made host-side batch assembly the learn
    loop's bottleneck.
    """
    return jax.jit(jax.vmap(lambda s: state_to_planes(eng, s)))


@functools.lru_cache(maxsize=None)
def _scatter_policy_fn(t: int, a: int):
    """Jitted dense policy/mask builder from padded sparse COO triples.

    Padded entries carry row == t and scatter into a dummy row that the
    output slices away.  Shipping the sparse triple instead of the dense
    [B, A] policy+mask cuts the host->device traffic per learn batch from
    ~5.8 MB to a few tens of KB — decisive over a tunneled accelerator
    link.  Recompiles per padded length bucket (powers of two).
    """

    @jax.jit
    def scatter(rows, cols, probs):
        pol = jnp.zeros((t + 1, a), jnp.float32).at[rows, cols].set(probs)
        msk = jnp.zeros((t + 1, a), bool).at[rows, cols].set(True)
        return pol[:t], msk[:t]

    return scatter


def scatter_policy(t: int, a: int, rows, cols, probs):
    """Dense (policy [t, A], mask [t, A]) from sparse numpy COO triples."""
    import numpy as np

    length = int(len(rows))
    pad = max(256, 1 << (length - 1).bit_length()) if length else 256
    r = np.full((pad,), t, np.int32)
    c = np.zeros((pad,), np.int32)
    p = np.zeros((pad,), np.float32)
    r[:length] = rows
    c[:length] = cols
    p[:length] = probs
    return _scatter_policy_fn(t, a)(r, c, p)
