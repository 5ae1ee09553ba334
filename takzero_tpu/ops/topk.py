"""Exact unsorted top-k: a Pallas TPU radix-select kernel (EXPERIMENT).

``jax.lax.top_k`` over the full action space is the single most expensive
non-matmul op in the fused search step (~27% of a selfplay sim-step at
A=9036; replacing it with a free stub measures 38.3k vs 30.1k sims/s).
The search kernels never depend on child-slot ORDER — descent argmax,
softmax probabilities, improved policy, and Gumbel root sampling are all
slot-permutation-invariant — so an *unsorted* exact selection suffices.

STATUS: exact on TPU but NOT faster — 0.98 ms vs lax.top_k's 0.39 ms
isolated ([128, 9036] -> 64). The radix select itself is cheap (~0.2 ms);
the slot-emission contraction dominates: per-row batched (1x128)@(128,64)
MXU matmuls are latency-bound, and every [R,128,K]-shaped alternative
pads K to 128 lanes and blows the 16 MB VMEM budget (measured 18-28 MB).
A future attempt should emit indices only (values via XLA gather) through
ONE large [S, A] @ [A, S*K] matmul with small-integer bf16 planes, which
needs a layout-preserving (S,R,128)->(S,R*128) collapse. Not wired into
search/core.py — kept with tests as the starting point for that attempt.

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
   ``k - count(key > threshold)``;
4. emit the selected (value, index) pairs to their output slots with a
   batched one-hot contraction (position == slot), again on the MXU.

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


def _topk_kernel(k: int, x_ref, vals_ref, idx_ref, posq_ref):
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

    def prefix(mf):  # [S,R,128] f32 mask -> strict flat-index prefix counts
        within = jax.lax.dot_general(
            mf, tri_l, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # [S,R,128]
        rowsum = jnp.sum(mf, axis=2)  # [S,R]
        rowcum = jax.lax.dot_general(
            rowsum, tri_r_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # [S,R]
        return within + rowcum[:, :, None]

    sel = gt + eq * (prefix(eq) < need_eq).astype(jnp.float32)
    pos = prefix(sel)
    # Stage through VMEM scratch: the per-row emit below reads rows back
    # with dynamic ref indexing (dynamic_slice on VALUES is unsupported).
    posq_ref[:] = jnp.where(sel > 0.0, pos, -1.0)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    fidx = (row_i * LANES + lane_i).astype(jnp.float32)
    slot_i = jax.lax.broadcasted_iota(jnp.int32, (r, k, LANES), 1).astype(
        jnp.float32
    )  # [R,K,128]: slots on SUBLANES — a [R,128,K] layout pads K to 128
    # lanes and doubles every 3D temp, blowing the 16 MB VMEM budget.

    def per_row(si, carry):
        tv = x_ref[pl.ds(si, 1), :, :][0]
        posq2 = posq_ref[pl.ds(si, 1), :, :].reshape(r, LANES)
        # Zero unselected values: the -inf padding would turn the 0-weight
        # products below into NaN.
        tv = jnp.where(posq2 >= 0.0, tv, 0.0)
        posq3 = posq2[:, None, :]
        onehot = (posq3 == slot_i).astype(jnp.float32)  # [R,K,128]

        def contract(v):
            out = jax.lax.dot_general(
                v[:, None, :], onehot, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # [R,1,K]
            return jnp.sum(out[:, 0, :], axis=0, keepdims=True)  # [1,K]

        vals_ref[pl.ds(si, 1), :] = contract(tv)
        idx_ref[pl.ds(si, 1), :] = (contract(fidx) + 0.5).astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, s, per_row, 0, unroll=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_top_k_unsorted(x: jnp.ndarray, k: int, interpret: bool = False):
    """(vals [B,k] f32, idx [B,k] i32): the k largest per row, unsorted.

    Ties toward lower indices; output ordered by ascending index.
    Requires A >= k.
    """
    b, a = x.shape
    assert a >= k, (a, k)
    r = pl.cdiv(a, LANES)
    s = ROWS_PER_PROGRAM
    bp = pl.cdiv(b, s) * s
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, bp - b), (0, r * LANES - a)),
        constant_values=-jnp.inf,
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
            scratch_shapes=[pltpu.VMEM((s, r, LANES), jnp.float32)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=bp * (35 * r * LANES + 2 * r * LANES * LANES + r * LANES * k * 3),
            bytes_accessed=x.size * 4 + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp)
    return vals[:b], idx[:b]


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
