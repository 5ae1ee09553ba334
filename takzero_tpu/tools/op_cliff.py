"""Microbenchmark: which tree-op primitive scales with pool size M?

Times fori_loops of single primitives over [B, M, C] pool arrays at a
sweep of M — row gather (`arr[bar, idx]`), row scatter
(`arr.at[bar, idx].set(row)`), element scatter-add (the path-visit
update), and a chained gather+scatter — to attribute the pool-size
search-cost cliff (tools/pool_cliff.py) to a specific XLA TPU lowering.

Usage: python -m takzero_tpu.tools.op_cliff [--pools 776,3104] [--iters 64]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pools", default="776,1552,3104")
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--children", type=int, default=256)
    p.add_argument("--depth", type=int, default=48)
    args = p.parse_args(argv)

    b, c, d = args.batch, args.children, args.depth
    bar = jnp.arange(b)
    key = jax.random.PRNGKey(0)

    def bench(name, fn, arrs, m):
        f = jax.jit(fn)
        out = f(*arrs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        out = f(*arrs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        dt = time.perf_counter() - t0
        print(f"M={m:5d} {name:28s} {dt/args.iters*1e6:9.1f} us/iter")

    for m_str in args.pools.split(","):
        m = int(m_str)
        arr = jax.random.normal(key, (b, m, c), jnp.float32)
        idx = jax.random.randint(key, (b,), 0, m)
        row = jax.random.normal(key, (b, c), jnp.float32)
        pidx = jax.random.randint(key, (b, d), 0, m)
        sidx = jax.random.randint(key, (b, d), 0, c)

        def gather_loop(arr, idx):
            def body(i, acc):
                return acc + arr[bar, (idx + i) % m].sum()

            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        def scatter_loop(arr, idx, row):
            def body(i, a):
                return a.at[bar, (idx + i) % m].set(row + i)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def scatter_add_loop(arr, pidx, sidx):
            def body(i, a):
                return a.at[bar[:, None], (pidx + i) % m, sidx].add(1.0)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def gather_scatter_loop(arr, idx, row):
            def body(i, a):
                r = a[bar, (idx + i) % m]
                return a.at[bar, (idx + i + 1) % m].set(r + 1.0)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def scatter8_loop(arr, idx, row):
            # 8 independent row scatters per iteration (one sim does ~15
            # row-level stores across the pool arrays).
            def body(i, a):
                for j in range(8):
                    a = a.at[bar, (idx + i + j) % m].set(row + i + j)
                return a

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def elem_scatter_loop(arr, idx, sidx):
            # [B]-indexed single-element store (forward's terminal stores,
            # apply_eval's leaf value/std stores).
            s0 = sidx[:, 0]

            def body(i, a):
                return a.at[bar, (idx + i) % m, s0].set(1.0 + i)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def flat_scatter_add_loop(arr, pidx, sidx):
            # Same path update through a flat [B, M*C] view: one index dim.
            def body(i, a):
                flat = a.reshape(b, m * c)
                lin = ((pidx + i) % m) * c + sidx
                flat = flat.at[bar[:, None], lin].add(1.0)
                return flat.reshape(b, m, c)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        def onehot_row_add_loop(arr, pidx, sidx):
            # Row-level scatter-add of one-hot [B, D, C] updates.
            oh = (sidx[:, :, None] == jnp.arange(c)[None, None, :]).astype(
                arr.dtype
            )

            def body(i, a):
                return a.at[bar[:, None], (pidx + i) % m].add(oh)

            return jax.lax.fori_loop(0, args.iters, body, arr)

        bench("row gather [B,C]", gather_loop, (arr, idx), m)
        bench("row scatter set", scatter_loop, (arr, idx, row), m)
        bench("path scatter-add [B,D]", scatter_add_loop, (arr, pidx, sidx), m)
        bench("flat path scatter-add", flat_scatter_add_loop, (arr, pidx, sidx), m)
        bench("onehot row scatter-add", onehot_row_add_loop, (arr, pidx, sidx), m)
        bench("elem scatter [B]", elem_scatter_loop, (arr, idx, sidx), m)
        bench("gather+scatter chain", gather_scatter_loop, (arr, idx, row), m)
        bench("8x row scatter", scatter8_loop, (arr, idx, row), m)


if __name__ == "__main__":
    main()
