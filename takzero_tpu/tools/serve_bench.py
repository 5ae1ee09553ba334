"""Measure the TEI serve-path nodes/s on the current accelerator.

Mirrors drivers/tei.py's `run_chunk` exactly (one plain simulation to
expand the root, then the wavefront serve kernel collecting
SIM_CHUNK-1 leaves per NN call — tei/src/main.rs:251-296's
simulate_batch loop) on the flagship net6_simhash config, so the number
printed here is the nps a warmed TEI session reports.

Usage:  python -m takzero_tpu.tools.serve_bench [--chunks 8] [--sim-chunk 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.config import NET_PRESETS
from takzero_tpu.models.agent import make_net_evaluate, new_agent
from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.serve import make_serve_chunk
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="net6_simhash")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--sim-chunk", type=int, default=128)
    p.add_argument("--max-nodes", type=int, default=4096)
    args = p.parse_args()

    cfg = NET_PRESETS[args.net]
    eng = engine(cfg.n, half_komi=cfg.half_komi)
    bundle = new_agent(cfg, seed=0)
    evaluator = make_net_evaluate(cfg, eng)

    simulate, _ = make_kernels(
        eng, lambda e: evaluator(bundle, e), max_depth=64
    )
    serve = make_serve_chunk(
        eng, lambda e: evaluator(bundle, e), args.sim_chunk - 1, max_depth=64
    )

    def run_chunk(tree):
        tree = simulate(tree, jnp.zeros(1))
        return serve(tree, jnp.zeros(1))

    run = jax.jit(run_chunk)

    envs = jax.tree.map(lambda x: x[None], eng.initial())
    tree = init_tree(eng, envs, args.max_nodes, 128)

    # Warmup/compile; the axon backend needs a host transfer to sync.
    tree = run(tree)
    np.asarray(tree.node_count)

    t0 = time.perf_counter()
    for _ in range(args.chunks):
        tree = run(tree)
    np.asarray(tree.node_count)
    dt = time.perf_counter() - t0
    nps = args.sim_chunk * args.chunks / dt
    print(
        f"serve nps: {nps:.0f}  ({args.chunks} chunks x {args.sim_chunk} "
        f"sims in {dt:.3f}s, net={args.net}, backend={jax.default_backend()})"
    )


if __name__ == "__main__":
    main()
