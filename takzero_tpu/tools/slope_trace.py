"""Trace the residual pool-size (M) slope to compiled-HLO differences.

round-4 established (tools/{op,phase,pool}_cliff.py) that after the
path-visit scatter fix the stub-search cost still rises ~0.64 ms/sim per
4x pool growth, attributed to the forward and apply_eval phases, while
every suspect primitive measures M-flat in isolation — an
"interaction/layout-level" residual.  This tool compiles the SAME fused
sim loop at two pool sizes and diffs the compiled modules:

* per-opcode × output-shape instruction counts (which ops' shapes carry
  the M dimension — i.e. which work XLA chose to do over the WHOLE pool
  per simulation rather than per touched row);
* the compiler's own cost analysis (FLOPs, bytes accessed) per module,
  whose ratio vs the M ratio says how much of the program scales with M
  by construction.

Usage:
    python -m takzero_tpu.tools.slope_trace [--pools 776,3104]
        [--out runs/slope_trace] [--sims 16]
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import re

import jax
import jax.numpy as jnp


def op_shape_histogram(hlo_text: str) -> collections.Counter:
    """opcode x output-shape counts from HLO text (fusion bodies included)."""
    hist = collections.Counter()
    for m in re.finditer(
        r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*((?:[a-z0-9]+\[[^\]]*\]|\([^)]*\))"
        r"[^ ]*)\s+([a-z\-]+)\(", hlo_text, re.M,
    ):
        shape, op = m.group(1), m.group(2)
        hist[(op, shape)] += 1
    return hist


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pools", default="776,3104")
    p.add_argument("--sims", type=int, default=16)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--children", type=int, default=256)
    p.add_argument("--max-depth", type=int, default=48)
    p.add_argument("--out", default="runs/slope_trace")
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
    opening = make_new_opening(eng)
    envs = opening(jax.random.PRNGKey(args.seed), args.batch)
    beta = jnp.full((args.batch,), 0.25, jnp.float32)

    def loop_full(tree):
        return jax.lax.fori_loop(
            0, args.sims, lambda i, t: simulate(t, beta), tree
        )

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    hists, costs = {}, {}
    for m_str in args.pools.split(","):
        m = int(m_str)
        tree0 = init_tree(eng, envs, m, args.children)
        compiled = jax.jit(loop_full).lower(tree0).compile()
        text = compiled.as_text()
        (out_dir / f"hlo_M{m}.txt").write_text(text)
        hists[m] = op_shape_histogram(text)
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            costs[m] = {
                k: ca.get(k) for k in ("flops", "bytes accessed")
            }
        except Exception as e:  # backend may not expose cost analysis
            costs[m] = {"error": str(e)}
        print(f"M={m}: {sum(hists[m].values())} instructions, "
              f"cost={costs[m]}", flush=True)

    ms = sorted(hists)
    if len(ms) == 2:
        lo, hi = ms
        lo_h, hi_h = hists[lo], hists[hi]

        # Tree pools allocate M+1 rows (scratch row, tree.py init_tree),
        # so compiled shapes carry M+1.
        def m_dim(shape: str, m: int) -> bool:
            return re.search(rf"\b{m + 1}\b", shape) is not None

        print(f"\n== ops whose OUTPUT shape carries M (per {args.sims} sims) ==")
        rows = []
        for (op, shape), n in hi_h.items():
            if m_dim(shape, hi):
                lo_shape = shape.replace(str(hi + 1), str(lo + 1))
                rows.append((op, shape, n, lo_h.get((op, lo_shape), 0)))
        rows.sort(key=lambda r: -r[2])
        for op, shape, n_hi, n_lo in rows[:40]:
            print(f"  {op:28s} {shape:48s} x{n_hi} (lo: x{n_lo})")
        report = out_dir / "report.txt"
        with open(report, "w") as f:
            f.write(f"pools {lo} vs {hi}; sims={args.sims}\n")
            f.write(f"costs: {costs}\n")
            for op, shape, n_hi, n_lo in rows:
                f.write(f"{op}\t{shape}\t{n_hi}\t{n_lo}\n")
        print(f"\nwrote {report} and hlo_M*.txt")


if __name__ == "__main__":
    main()
