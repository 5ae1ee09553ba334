"""Pallas TPU kernels for the hot non-conv ops.

``simhash_pack`` fuses the SimHash projection (an MXU matmul), the sign
threshold, and the bit-pack reduction into one VMEM-resident kernel — the
pure-XLA path materializes the [B, bits] dot matrix in HBM between the
matmul and the pack.  Used by models/agent.simhash_indices on every
search-batch evaluation and every novelty-set update.

On non-TPU backends (CPU tests, virtual meshes) the caller falls back to
the identical pure-JAX computation; ``interpret=True`` runs the kernel
in the Pallas interpreter for equality tests anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _simhash_kernel(x_ref, m_ref, out_ref):
    # x: [TB, In] f32, m: [In, bits] f32, out: [TB, 1] uint32 (padded lanes).
    # Mosaic has no unsigned reductions; sum in int32 (two's complement has
    # the same bit pattern) and bitcast to uint32 at the end.
    # HIGHEST: the MXU's default bf16 passes can flip the sign of
    # near-zero dots vs the f32 CPU fallback, yielding different hash
    # indices for the same position across backends (hash_indices'
    # reproducibility contract).
    dots = jnp.dot(
        x_ref[:],
        m_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bits = (dots >= 0.0).astype(jnp.int32)  # [TB, bits]
    nbits = bits.shape[1]
    powers = (
        jnp.int32(1)
        << jax.lax.broadcasted_iota(jnp.int32, (1, nbits), dimension=1)
    )
    packed = jnp.sum(bits * powers, axis=1, keepdims=True, dtype=jnp.int32)
    out_ref[:] = pltpu.bitcast(packed, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def simhash_pack(x: jnp.ndarray, matrix: jnp.ndarray, interpret: bool = False):
    """uint32[B] = pack(sign_bits(x @ matrix)); one fused Pallas call.

    x: [B, In] float32 (flattened planes), matrix: [In, bits<=32] float32.
    """
    b = x.shape[0]
    tile_b = min(b, 256) if b % 128 == 0 or b < 128 else 128
    grid = (pl.cdiv(b, tile_b),)
    out = pl.pallas_call(
        _simhash_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tile_b, x.shape[1]),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (matrix.shape[0], matrix.shape[1]),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * x.shape[1] * matrix.shape[1],
            bytes_accessed=(x.size + matrix.size) * 4 + b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, matrix)
    return out[:, 0]


def simhash_pack_reference(x: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX equivalent (the non-TPU fallback)."""
    dots = jnp.matmul(x, matrix, precision=jax.lax.Precision.HIGHEST)
    bits = (dots >= 0).astype(jnp.uint32)
    powers = jnp.uint32(1) << jnp.arange(matrix.shape[1], dtype=jnp.uint32)
    return jnp.sum(bits * powers[None, :], axis=-1, dtype=jnp.uint32)


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
