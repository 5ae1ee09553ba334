"""Exact unsorted top-k: a Pallas TPU radix-select kernel.

``jax.lax.top_k`` over the full action space is the single most expensive
non-matmul op in the fused search step (~27% of a selfplay sim-step at
A=9036; replacing it with a free stub measures 38.3k vs 30.1k sims/s).
The search kernels never depend on child-slot ORDER — descent argmax,
softmax probabilities, improved policy, and Gumbel root sampling are all
slot-permutation-invariant — so an *unsorted* exact selection suffices.

Selection semantics: the k largest values per row, ties broken toward
lower indices, output ordered by ascending index. (``lax.top_k``'s own
tie-break is NOT strictly index-ascending, so outputs are compared as
selections against the rule, not positionally against lax.)

Algorithm, 8 batch rows per program, everything VMEM-resident:
1. map float32 to order-preserving *signed* int32 keys
   (``b >= 0 ? b : b ^ 0x7fffffff`` on the raw bits);
2. radix-select each row's kth-largest key: sign plane, then 31
   magnitude bits MSB-first, one masked count per step (vectorized over
   the 8 rows);
3. rank ties (elements == threshold) by flat index via prefix sums
   (within-lane-row prefix = a [128,128] triangular matmul on the MXU,
   across-row prefix = an [R,R] triangular matmul), keep the first
   ``k - count(key > threshold)`` — giving the selection mask ``sel``;
4. emit by *rank search* instead of one-hot scatter: per output slot k,
   locate its source lane-row r_k through compares of the exclusive
   row-prefix ``[P <= k] - [P+c <= k]`` (a [K,R] one-hot), pull that
   row's within-row prefix/mask/values with ONE batched [K,R] @ [R,384]
   matmul, and select the unique lane where the within-row rank equals
   ``k - P[r_k]``.  No [R,K,128] temporaries, no per-row loop — this is
   what a previous one-hot-emit design paid ~0.8 ms for (per-row
   (1x128)@(128,64) matmuls are latency-bound, and [R,128,K] layouts pad
   K to 128 lanes and blow the 16 MB VMEM budget).

Mosaic notes: no unsigned types anywhere (signed-key trick instead), no
cumsum (triangular matmuls instead), scalar reductions via keepdims, and
Precision.HIGHEST on every dot — the MXU's default bf16 passes cannot
represent integer counts/indices above 256 exactly (265 rounds to 264).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_PROGRAM = 8
INT_MIN = -(2**31)
_HI = jax.lax.Precision.HIGHEST


def _topk_kernel(k: int, x_ref, vals_ref, idx_ref):
    t_all = x_ref[:]  # [S, R, 128] f32 (padded with -inf)
    s, r, _ = t_all.shape

    bits = pltpu.bitcast(t_all, jnp.int32)
    key = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)

    def count_ge(tau):  # tau [S,1] -> [S,1] f32 (counts < 2^24: exact)
        m = (key >= tau[:, :, None]).astype(jnp.float32)
        return jnp.sum(jnp.sum(m, axis=2), axis=1, keepdims=True)

    kf = jnp.float32(k)
    zero = jnp.zeros((s, 1), jnp.int32)
    tau0 = jnp.where(count_ge(zero) >= kf, zero, jnp.full_like(zero, INT_MIN))

    def sel_bit(i, tau):
        cand = tau | (jnp.int32(1) << (30 - i))
        return jnp.where(count_ge(cand) >= kf, cand, tau)

    tau = jax.lax.fori_loop(0, 31, sel_bit, tau0)

    gt = (key > tau[:, :, None]).astype(jnp.float32)
    eq = (key == tau[:, :, None]).astype(jnp.float32)
    m = jnp.sum(jnp.sum(gt, axis=2), axis=1, keepdims=True)
    need_eq = (kf - m)[:, :, None]  # [S,1,1]

    tri_l = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.float32)
    tri_r_t = (
        jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    ).astype(jnp.float32)  # [j, r'] = j < r'

    def within_prefix(mf):  # [S,R,128] mask -> strict within-row prefix
        return jax.lax.dot_general(
            mf, tri_l, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    def row_exclusive(rowsum):  # [S,R] counts -> exclusive row prefix
        return jax.lax.dot_general(
            rowsum, tri_r_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    eq_w = within_prefix(eq)
    eq_p = row_exclusive(jnp.sum(eq, axis=2))
    sel = gt + eq * ((eq_w + eq_p[:, :, None]) < need_eq).astype(jnp.float32)

    # Rank-search emit (step 4 of the module docstring).
    w_in = within_prefix(sel)  # [S,R,128] strict within-row rank
    c_row = jnp.sum(sel, axis=2)  # [S,R]
    p_row = row_exclusive(c_row)  # [S,R] exclusive prefix

    # Mosaic requires integer iota results; build int32 and cast.
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32
        )

    kio = fiota((s, k, r), 1)  # slot ids
    pb = p_row[:, None, :]  # [S,1,R]
    cb = c_row[:, None, :]
    oh_r = (pb <= kio).astype(jnp.float32) - (pb + cb <= kio).astype(
        jnp.float32
    )  # [S,K,R] one-hot: the lane-row holding rank k

    xz = sel * t_all  # inputs are clamped finite by the wrapper, so
    # masking by multiply is safe (0 * x never hits an inf/NaN)
    rhs = jnp.concatenate([w_in, sel, xz], axis=2)  # [S,R,384]
    got = jax.lax.dot_general(
        oh_r, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # [S,K,384]: the chosen row's prefix / mask / values per slot
    w_k = got[:, :, :LANES]
    sel_k = got[:, :, LANES : 2 * LANES]
    x_k = got[:, :, 2 * LANES :]

    kk = fiota((s, k), 1)
    t_k = kk - jnp.sum(oh_r * pb, axis=2)  # within-row target rank
    r_k = jnp.sum(oh_r * fiota((s, k, r), 2), axis=2)
    pick = sel_k * (w_k == t_k[:, :, None]).astype(jnp.float32)  # [S,K,128]
    lane = jnp.sum(pick * fiota((s, k, LANES), 2), axis=2)
    vals_ref[:] = jnp.sum(pick * x_k, axis=2)
    idx_ref[:] = (r_k * LANES + lane + 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_top_k_unsorted(x: jnp.ndarray, k: int, interpret: bool = False):
    """(vals [B,k] f32, idx [B,k] i32): the k largest per row, unsorted.

    Ties toward lower indices; output ordered by ascending index.
    Requires A >= k.

    ±inf inputs are safe and come back as ±inf (like ``lax.top_k`` when a
    row has fewer than k finite entries).  Internally they are clamped to
    ``finfo(f32).min/max`` so a selected inf cannot poison the emit
    matmul (0 * inf = NaN); the one visible consequence is that genuine
    finfo.min/max inputs tie with ∓inf (index order) and also return inf.
    """
    b, a = x.shape
    assert a >= k, (a, k)
    r = pl.cdiv(a, LANES)
    s = ROWS_PER_PROGRAM
    bp = pl.cdiv(b, s) * s
    f32_min = jnp.finfo(jnp.float32).min
    f32_max = jnp.finfo(jnp.float32).max
    xp = jnp.pad(
        jnp.clip(x.astype(jnp.float32), f32_min, f32_max),
        ((0, bp - b), (0, r * LANES - a)),
        constant_values=f32_min,
    ).reshape(bp, r, LANES)
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k),
        out_shape=(
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=(bp // s,),
            in_specs=[
                pl.BlockSpec(
                    (s, r, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=(
                pl.BlockSpec((s, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=bp
            * (35 * r * LANES + 2 * r * LANES * LANES + 2 * k * r * 3 * LANES),
            bytes_accessed=x.size * 4 + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp)
    vals = jnp.where(vals <= f32_min, -jnp.inf, vals)
    vals = jnp.where(vals >= f32_max, jnp.inf, vals)
    return vals[:b], idx[:b]


@functools.partial(jax.jit, static_argnames=("k", "groups"))
def exact_top_k_unsorted_grouped(x: jnp.ndarray, k: int, groups: int = 8):
    """Exact top-k via two-stage grouped ``lax.top_k`` (pure XLA).

    Split each row into `groups` contiguous chunks, take top-k per chunk,
    then top-k over the groups*k survivors — every global top-k element
    is necessarily in its own chunk's top-k, so the result is exact.
    Both stages run on much smaller trailing dims than one monolithic
    A-wide ``lax.top_k`` (A=9036 -> 1130 and groups*k), which is the
    standard XLA trick for large-A selection.  Tie-break among exactly
    equal boundary values may differ from ``lax.top_k``'s; the search is
    selection-invariant under ties (see module docstring).
    """
    b, a = x.shape
    assert a >= k, (a, k)
    groups = max(1, min(groups, a // k))  # each chunk must hold >= k
    if groups == 1:
        return jax.lax.top_k(x, k)
    pad = (-a) % groups
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    sub = xp.reshape(b, groups, -1)
    v1, i1 = jax.lax.top_k(sub, k)  # [B,G,k]
    base = jnp.arange(groups, dtype=jnp.int32)[None, :, None] * sub.shape[-1]
    i1 = i1.astype(jnp.int32) + base
    v2, i2 = jax.lax.top_k(v1.reshape(b, groups * k), k)
    idx = jnp.take_along_axis(i1.reshape(b, groups * k), i2, axis=-1)
    return v2, idx


def exact_top_k_unsorted_reference(x: jnp.ndarray, k: int):
    """Pure-JAX fallback with identical semantics (exact tie-break).

    A stable two-operand ``lax.sort`` on (-x, index) sorts descending by
    value with ties in ascending index order — exactly the kernel's
    selection — without any 64-bit arithmetic (works with x64 disabled,
    where an int64 composite key would silently truncate to int32).
    """
    a = x.shape[-1]
    idxs = jnp.broadcast_to(jnp.arange(a, dtype=jnp.int32), x.shape)
    _, sorted_idx = jax.lax.sort(
        (-x, idxs), num_keys=1, is_stable=True
    )
    top_idx = jnp.sort(sorted_idx[..., :k], axis=-1)
    vals = jnp.take_along_axis(x, top_idx, axis=-1)
    return vals, top_idx
