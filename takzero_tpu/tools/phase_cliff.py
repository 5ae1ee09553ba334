"""Attribute residual pool-size (M) scaling to a search phase.

Times fori_loops of (a) forward only, (b) forward+apply_eval, (c) full
simulate — stub evaluator — at a sweep of pool sizes.  The deltas
localize which phase still scales with M after the path-visit scatter
fix (tools/scatter_variants.py).

Usage: python -m takzero_tpu.tools.phase_cliff [--pools 776,3104]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pools", default="776,3104")
    p.add_argument("--sims", type=int, default=128)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--children", type=int, default=256)
    p.add_argument("--max-depth", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..search.core import make_kernels
    from ..search.openings import make_new_opening
    from ..search.tree import init_tree
    from ..tak import engine

    eng = engine(6, half_komi=4)
    a = eng.num_actions

    def evaluator(envs):
        b = envs.ply.shape[0]
        return (
            jnp.zeros((b, a), jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.full((b,), 0.25, jnp.float32),
        )

    simulate, _ = make_kernels(eng, evaluator, max_depth=args.max_depth)
    fwd = simulate.phases["forward"]
    app = simulate.phases["apply_eval"]
    bwd = simulate.phases["backward"]

    opening = make_new_opening(eng)
    envs = opening(jax.random.PRNGKey(args.seed), args.batch)
    beta = jnp.full((args.batch,), 0.25, jnp.float32)

    def loop_fwd(tree):
        def body(i, t):
            t, rec = fwd(t, beta, None, False)
            return t

        return jax.lax.fori_loop(0, args.sims, body, tree)

    def loop_fwd_app(tree):
        def body(i, t):
            t, rec = fwd(t, beta, None, False)
            lg, vn, vr = evaluator(rec["env_eval"])
            return app(t, rec, lg, vn, vr)

        return jax.lax.fori_loop(0, args.sims, body, tree)

    def loop_full(tree):
        def body(i, t):
            return simulate(t, beta)

        return jax.lax.fori_loop(0, args.sims, body, tree)

    for m_str in args.pools.split(","):
        m = int(m_str)
        tree0 = init_tree(eng, envs, m, args.children)
        for name, fn in (
            ("forward", loop_fwd),
            ("fwd+apply", loop_fwd_app),
            ("full", loop_full),
        ):
            f = jax.jit(fn)
            out = f(tree0)
            np.asarray(out.root_visit)
            t0 = time.perf_counter()
            out = f(tree0)
            np.asarray(out.root_visit)
            dt = time.perf_counter() - t0
            print(
                f"M={m:5d} {name:10s} {dt/args.sims*1e3:7.3f} ms/sim",
                flush=True,
            )


if __name__ == "__main__":
    main()
