"""Benchmark: MCTS simulations/second in the reference selfplay
configuration (6x6, 128 parallel games, Gumbel-SH k=64, budget=768,
16x256 ResNet + SimHash novelty), on whatever accelerator JAX sees.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers, so vs_baseline is anchored
by measurement instead: tools/anchor.py runs the reference's architecture
with the engines this host can actually execute (C++ pointer-tree MCTS +
torch-CPU 16x256 ResNet; the Rust toolchain/CUDA the reference needs do
not exist here) and records reference_on_this_host_sims_per_s_total in
BASELINE.json — vs_baseline is measured sims/s over that. Falls back to
1.0 if the anchor has not been recorded.

Env overrides: TAKZERO_BENCH_BATCH, TAKZERO_BENCH_BUDGET,
TAKZERO_BENCH_MOVES, TAKZERO_BENCH_FILTERS, TAKZERO_BENCH_BLOCKS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax

    from takzero_tpu.models.agent import make_net_evaluate, new_agent
    from takzero_tpu.models.network import NetConfig
    from takzero_tpu.search.gumbel import make_gumbel_search
    from takzero_tpu.search.openings import make_new_opening
    from takzero_tpu.search.tree import init_tree
    from takzero_tpu.tak import engine

    batch = int(os.environ.get("TAKZERO_BENCH_BATCH", 128))
    budget = int(os.environ.get("TAKZERO_BENCH_BUDGET", 768))
    sampled = int(os.environ.get("TAKZERO_BENCH_SAMPLED", 64))
    moves = int(os.environ.get("TAKZERO_BENCH_MOVES", 2))
    filters = int(os.environ.get("TAKZERO_BENCH_FILTERS", 256))
    blocks = int(os.environ.get("TAKZERO_BENCH_BLOCKS", 16))

    cfg = NetConfig(
        n=6, half_komi=4, filters=filters, blocks=blocks,
        novelty="simhash", hash_bits=26,
    )
    eng = engine(6, half_komi=4)
    bundle = new_agent(cfg, seed=0)
    evaluator = make_net_evaluate(cfg, eng)

    def search_step(tree, key, bundle):
        search = make_gumbel_search(
            eng,
            lambda envs: evaluator(bundle, envs),
            sampled,
            budget,
            max_depth=48,
        )
        return search(tree, key, 0.0)

    search_jit = jax.jit(search_step)

    opening = make_new_opening(eng, random_steps=4)
    envs = opening(jax.random.PRNGKey(0), batch)
    tree0 = init_tree(eng, envs, budget + 8, 128)

    import numpy as np

    # Warmup (compile). NOTE: under the axon remote backend,
    # block_until_ready does not await remote execution — a host transfer
    # does, so force one for honest timing.
    tree, slot = search_jit(tree0, jax.random.PRNGKey(1), bundle)
    np.asarray(slot)

    t0 = time.perf_counter()
    for i in range(moves):
        tree, slot = search_jit(tree0, jax.random.PRNGKey(2 + i), bundle)
        np.asarray(slot)
    dt = time.perf_counter() - t0

    sims_per_move = (budget + 1) * batch  # +1 root-init simulation
    sims_per_s = sims_per_move * moves / dt

    vs_baseline = 1.0
    try:
        baseline = json.load(
            open(os.path.join(os.path.dirname(__file__), "BASELINE.json"))
        )
        anchor = baseline["published"][
            "reference_on_this_host_sims_per_s_total"
        ]
        vs_baseline = round(sims_per_s / anchor, 2)
    except (OSError, KeyError, ValueError):
        pass
    print(
        json.dumps(
            {
                "metric": "mcts_sims_per_s_selfplay_6x6",
                "value": round(sims_per_s, 1),
                "unit": "simulations/s (batch=128, k=64, budget=768, 16x256 net)",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
