"""Variant shoot-out for the path visit scatter-add (the pool-size cliff).

op_cliff.py attributed the ~24%-per-pool-doubling search cost entirely to
the one deferred path scatter-add (core.py:238-240): [B, D] (row, slot)
element adds into [B, M, C] scale linearly with M while every other tree
primitive is flat.  This tool times candidate reformulations:

* baseline       — exactly core.py's `.at[bar, node.clip(0), slot.clip(0)].add`
* unique         — padding routed to (scratch row, depth) so every index in
                   a lane is genuinely distinct -> unique_indices=True +
                   mode="promise_in_bounds"
* onehot_row     — row-level add of one-hot [B, D, C] updates
* onehot_unique  — onehot + unique_indices/promise_in_bounds
* matmul         — dense one-hot contraction: visit += sum_d onehot_m[d,M] x
                   onehot_c[d,C] via einsum (pure MXU, no scatter at all)

Usage: python -m takzero_tpu.tools.scatter_variants [--pools 776,1552,3104]
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
    p.add_argument("--dtype", default="int32")
    args = p.parse_args(argv)

    b, c, d = args.batch, args.children, args.depth
    dt = jnp.dtype(args.dtype)
    bar = jnp.arange(b)
    key = jax.random.PRNGKey(0)

    def bench(name, fn, arrs, m):
        f = jax.jit(fn)
        out = f(*arrs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        out = f(*arrs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        dtm = time.perf_counter() - t0
        print(f"M={m:5d} {name:24s} {dtm/args.iters*1e6:9.1f} us/iter")

    for m_str in args.pools.split(","):
        m = int(m_str)
        scratch = m - 1
        arr = jnp.zeros((b, m, c), dt)
        # Realistic path indices: unique rows per lane, ~1/3 padded (-1).
        perm = jax.vmap(lambda k: jax.random.permutation(k, m - 1))(
            jax.random.split(key, b)
        )
        pidx = perm[:, :d].astype(jnp.int32)
        length = jax.random.randint(key, (b, 1), d // 3, d)
        mask = jnp.arange(d)[None, :] < length
        pidx = jnp.where(mask, pidx, -1)
        sidx = jnp.where(
            mask, jax.random.randint(key, (b, d), 0, c), -1
        ).astype(jnp.int32)
        upd = mask.astype(dt)
        diota = jnp.arange(d, dtype=jnp.int32)

        def baseline(a, pidx, sidx, upd):
            def body(i, a):
                return a.at[
                    bar[:, None], jnp.roll(pidx, i, 1).clip(0), sidx.clip(0)
                ].add(upd)

            return jax.lax.fori_loop(0, args.iters, body, a)

        def unique(a, pidx, sidx, upd):
            # Padding -> (scratch, depth): distinct, in-bounds, dead row.
            def body(i, a):
                pr = jnp.roll(pidx, i, 1)
                node = jnp.where(pr >= 0, pr, scratch)
                slot = jnp.where(pr >= 0, sidx.clip(0), diota[None, :])
                return a.at[bar[:, None], node, slot].add(
                    upd,
                    mode="promise_in_bounds",
                    unique_indices=True,
                )

            return jax.lax.fori_loop(0, args.iters, body, a)

        def onehot_row(a, pidx, sidx, upd):
            def body(i, a):
                oh = (sidx[:, :, None] == jnp.arange(c)[None, None, :]).astype(
                    a.dtype
                )
                return a.at[bar[:, None], jnp.roll(pidx, i, 1).clip(0)].add(oh)

            return jax.lax.fori_loop(0, args.iters, body, a)

        def onehot_unique(a, pidx, sidx, upd):
            def body(i, a):
                pr = jnp.roll(pidx, i, 1)
                node = jnp.where(pr >= 0, pr, scratch)
                oh = (sidx[:, :, None] == jnp.arange(c)[None, None, :]).astype(
                    a.dtype
                )
                return a.at[bar[:, None], node].add(
                    oh, mode="promise_in_bounds", unique_indices=True
                )

            return jax.lax.fori_loop(0, args.iters, body, a)

        def matmul(a, pidx, sidx, upd):
            # visit[b] += onehot_m[b,d,M]^T @ onehot_c[b,d,C]; fully dense.
            def body(i, a):
                pr = jnp.roll(pidx, i, 1)
                ohm = (pr[:, :, None] == jnp.arange(m)[None, None, :]).astype(
                    jnp.float32
                )
                ohc = (sidx[:, :, None] == jnp.arange(c)[None, None, :]).astype(
                    jnp.float32
                )
                return a + jnp.einsum("bdm,bdc->bmc", ohm, ohc).astype(a.dtype)

            return jax.lax.fori_loop(0, args.iters, body, a)

        bench("baseline clip(0)", baseline, (arr, pidx, sidx, upd), m)
        bench("unique+inbounds", unique, (arr, pidx, sidx, upd), m)
        bench("onehot row", onehot_row, (arr, pidx, sidx, upd), m)
        bench("onehot row unique", onehot_unique, (arr, pidx, sidx, upd), m)
        bench("dense matmul", matmul, (arr, pidx, sidx, upd), m)

        # Correctness cross-check (one application, no roll).
        ref = np.asarray(
            jax.jit(
                lambda a: a.at[
                    bar[:, None], pidx.clip(0), sidx.clip(0)
                ].add(upd)
            )(arr)
        )

        def unique1(a):
            node = jnp.where(pidx >= 0, pidx, scratch)
            slot = jnp.where(pidx >= 0, sidx.clip(0), diota[None, :])
            return a.at[bar[:, None], node, slot].add(
                upd, mode="promise_in_bounds", unique_indices=True
            )

        got = np.asarray(jax.jit(unique1)(arr))
        assert (got[:, : m - 1] == ref[:, : m - 1]).all(), "unique mismatch"
        print(f"M={m:5d} correctness: unique matches baseline on live rows")


if __name__ == "__main__":
    main()
