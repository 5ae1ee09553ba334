"""Profile the pool-size search-cost cliff (VERDICT r3 item 1).

Search cost was measured to grow ~24% per pool-size doubling at C=256
even though every per-simulation op is row-indexed (gathers/scatters of
[B, C] rows out of [B, M, C] arrays) and should be M-independent.  This
tool isolates the scaling:

* times a fori_loop of `simulate` calls (the exact per-sim kernel the
  drivers run, search/core.py) at a sweep of pool sizes M, with the
  flagship 16x256 net or a uniform stub evaluator (`--stub` removes the
  NN so tree ops dominate);
* prints XLA's own cost model per M (`compiled.cost_analysis()`: bytes
  accessed / flops) — if bytes scale with M, the lowering is reading or
  copying whole pool arrays per simulation;
* `--dump-hlo DIR` writes the compiled HLO text per M for op-level
  attribution (grep for full-shape `copy`/`fusion` ops inside the loop).

Usage:
    python -m takzero_tpu.tools.pool_cliff [--pools 776,1552,3104]
        [--sims 128] [--batch 128] [--children 256] [--stub]
        [--reps 3] [--dump-hlo DIR]
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
    p.add_argument("--sims", type=int, default=128)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--children", type=int, default=256)
    p.add_argument("--max-depth", type=int, default=48)
    p.add_argument("--stub", action="store_true", help="uniform evaluator")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dump-hlo", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..models.agent import make_net_evaluate, new_agent
    from ..models.network import NetConfig
    from ..search.core import make_simulate
    from ..search.openings import make_new_opening
    from ..search.tree import init_tree
    from ..tak import engine

    eng = engine(6, half_komi=4)
    a = eng.num_actions
    if args.stub:
        bundle = None

        def evaluator(envs):
            b = envs.ply.shape[0]
            return (
                jnp.zeros((b, a), jnp.float32),
                jnp.zeros((b,), jnp.float32),
                jnp.full((b,), 0.25, jnp.float32),
            )

    else:
        cfg = NetConfig(
            n=6, half_komi=4, filters=256, blocks=16,
            novelty="simhash", hash_bits=26,
        )
        bundle = new_agent(cfg, seed=args.seed)
        net_eval = make_net_evaluate(cfg, eng)

    opening = make_new_opening(eng)
    envs = opening(jax.random.PRNGKey(args.seed), args.batch)

    for m_str in args.pools.split(","):
        m = int(m_str)

        def loop(tree, bundle):
            if args.stub:
                ev = evaluator
            else:
                ev = lambda e: net_eval(bundle, e)  # noqa: E731
            simulate = make_simulate(eng, ev, max_depth=args.max_depth)
            beta = jnp.full((args.batch,), 0.25, jnp.float32)

            def body(i, t):
                return simulate(t, beta)

            return jax.lax.fori_loop(0, args.sims, body, tree)

        tree0 = init_tree(eng, envs, m, args.children)
        fn = jax.jit(loop)
        lowered = fn.lower(tree0, bundle)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            bytes_acc = ca.get("bytes accessed", float("nan"))
            flops = ca.get("flops", float("nan"))
        except Exception as e:  # pragma: no cover - backend-dependent
            bytes_acc = flops = float("nan")
            print(f"M={m}: cost_analysis unavailable: {e}")
        if args.dump_hlo:
            import pathlib

            d = pathlib.Path(args.dump_hlo)
            d.mkdir(parents=True, exist_ok=True)
            (d / f"hlo_m{m}.txt").write_text(compiled.as_text())

        # Warm + time.  NOTE: axon backend — block_until_ready does not
        # await remote execution; force a host transfer.
        out = fn(tree0, bundle)
        np.asarray(out.root_visit)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(tree0, bundle)
            np.asarray(out.root_visit)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        sims_s = args.sims * args.batch / dt
        print(
            f"M={m}: {dt:.3f}s for {args.sims} sims x B={args.batch} "
            f"-> {sims_s:,.0f} sims/s | per-sim {dt/args.sims*1e3:.2f} ms | "
            f"bytes_accessed={bytes_acc:.3e} ({bytes_acc/args.sims/1e6:.1f} "
            f"MB/sim) flops={flops:.3e}"
        )


if __name__ == "__main__":
    main()
