"""Discriminate the residual pool-size slope: read+write coupling.

round-4's op_cliff measured row-indexed scatters and gathers M-FLAT in
isolation, yet the fused sim loop still pays ~+0.45 GB/sim per +768 pool
rows (tools/slope_trace.py: compiled bytes-accessed scales with M while
FLOPs stay flat).  Hypothesis: when the SAME loop-carried [B, M, C]
array is both gathered-from and row-scattered-to in one iteration — the
real forward/apply_eval pattern — the TPU lowering cannot prove in-place
aliasing across the fusion boundary and materializes a full-array
copy inside the scatter, restoring O(M) traffic per sim.

Three fori_loop bodies, per pool size:
  scatter   — row scatter only (op_cliff's M-flat case; the control);
  gather    — row gather only (control);
  gather+sc — gather a row, compute, scatter back to the SAME array.

If gather+sc scales with M while the controls stay flat, the mechanism
is proven: the residual is XLA's aliasing conservatism on read+write
coupled buffers, not any single primitive.

Usage: python -m takzero_tpu.tools.rw_cliff [--pools 776,1544,3104]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pools", default="776,1544,3104")
    p.add_argument("--iters", type=int, default=128)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--children", type=int, default=256)
    args = p.parse_args(argv)
    b, c = args.batch, args.children
    lanes = jnp.arange(b)

    def body_scatter(i, arr):
        rows = (i * 7 + lanes) % arr.shape[1]
        upd = jnp.full((b, c), i, arr.dtype)
        return arr.at[lanes, rows].set(upd)

    def body_gather(i, arr):
        rows = (i * 7 + lanes) % arr.shape[1]
        g = arr[lanes, rows]  # [b, c]
        return arr.at[lanes, 0].max(g * 0 + i)  # touch row 0 only

    def body_rw(i, arr):
        rows = (i * 7 + lanes) % arr.shape[1]
        g = arr[lanes, rows]
        return arr.at[lanes, (rows + 1) % arr.shape[1]].set(g + 1)

    results = {}
    for m_str in args.pools.split(","):
        m = int(m_str)
        arr0 = jnp.zeros((b, m, c), jnp.float32)
        for name, body in (
            ("scatter", body_scatter),
            ("gather", body_gather),
            ("gather+sc", body_rw),
        ):
            # Return a SCALAR: transferring the full [B, M, C] result over
            # the remote link is itself O(M) and would swamp the signal
            # (CLAUDE.md timing rule — small host readback only).
            f = jax.jit(
                lambda a, body=body: jnp.sum(
                    jax.lax.fori_loop(0, args.iters, body, a)[:, 0, 0]
                )
            )
            np.asarray(f(arr0))  # compile + sync
            t0 = time.perf_counter()
            np.asarray(f(arr0))
            dt = (time.perf_counter() - t0) / args.iters * 1e6
            results[(m, name)] = dt
            print(f"M={m:5d} {name:10s} {dt:8.1f} us/iter", flush=True)
    ms = sorted({m for m, _ in results})
    if len(ms) >= 2:
        print("\nslope vs M (us/iter per pool doubling):")
        for name in ("scatter", "gather", "gather+sc"):
            xs = [results[(m, name)] for m in ms]
            print(f"  {name:10s} " + " -> ".join(f"{x:.1f}" for x in xs))


if __name__ == "__main__":
    main()
