"""Benchmark: MCTS simulations/second in the reference selfplay
configuration (6x6, 128 parallel games, Gumbel-SH k=64, budget=768,
16x256 ResNet + SimHash novelty), on whatever accelerator JAX sees.

This measures the EXACT device program drivers/selfplay.py dispatches per
move — SelfplayEngine's jitted move (search + move select + cross-move
tree descent with the flagship 256-child slots and reuse-sized pool +
the packed int32 host export) — not a lighter fresh-tree approximation,
so the headline number is what the real actor achieves minus file I/O.

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
TAKZERO_BENCH_MOVES, TAKZERO_BENCH_FILTERS, TAKZERO_BENCH_BLOCKS,
TAKZERO_BENCH_CHILDREN, TAKZERO_BENCH_REUSE (0 disables tree reuse),
TAKZERO_BENCH_CKPT (path to a trained checkpoint — descent depth is
data-dependent, and trained weights search FASTER than random init:
sharp priors concentrate descents and reach terminals/solver proofs at
shallower depth, measured 30.4k vs 21.1k sims/s on v5e; the full
reconciliation against the real driver's s/move is in
examples/README.md), TAKZERO_BENCH_VERBOSE (1: per-move seconds on
stderr, for spread).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # Honor an explicit JAX_PLATFORMS even under the axon sitecustomize
    # (which force-registers the remote-TPU backend); same re-apply as
    # drivers/__init__.py, so a local CPU smoke run never tunnels ops to
    # a chip another job owns.
    _requested = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _requested:
        import jax

        try:
            jax.config.update("jax_platforms", _requested)
        except Exception:
            pass
    import jax
    import numpy as np

    from takzero_tpu.config import selfplay_preset
    from takzero_tpu.models.agent import make_net_evaluate, new_agent
    from takzero_tpu.models.network import NetConfig
    from takzero_tpu.selfplay import SelfplayEngine
    from takzero_tpu.tak import engine

    batch = int(os.environ.get("TAKZERO_BENCH_BATCH", 128))
    budget = int(os.environ.get("TAKZERO_BENCH_BUDGET", 768))
    sampled = int(os.environ.get("TAKZERO_BENCH_SAMPLED", 64))
    moves = int(os.environ.get("TAKZERO_BENCH_MOVES", 2))
    filters = int(os.environ.get("TAKZERO_BENCH_FILTERS", 256))
    blocks = int(os.environ.get("TAKZERO_BENCH_BLOCKS", 16))
    children = os.environ.get("TAKZERO_BENCH_CHILDREN")
    reuse = os.environ.get("TAKZERO_BENCH_REUSE", "1") != "0"
    ckpt_path = os.environ.get("TAKZERO_BENCH_CKPT")
    verbose = os.environ.get("TAKZERO_BENCH_VERBOSE", "0") != "0"

    # Checkpoints carry the preset's full 2^32-bit SimHash set; the
    # synthetic-weights default shrinks it to keep bench start cheap.
    cfg = NetConfig(
        n=6, half_komi=4, filters=filters, blocks=blocks,
        novelty="simhash", hash_bits=32 if ckpt_path else 26,
    )
    eng = engine(6, half_komi=4)
    bundle = new_agent(cfg, seed=0)
    if ckpt_path:
        from takzero_tpu.utils import ckpt

        bundle = ckpt.load_checkpoint_partial(ckpt_path, bundle)
    evaluator = make_net_evaluate(cfg, eng)

    # The flagship selfplay preset (selfplay/src/main.rs:36-52): 256 child
    # slots at 6x6, reuse-doubled node pool, budget 768, k=64.
    overrides = dict(
        batch=batch, search_budget=budget, sampled_actions=sampled,
        tree_reuse=reuse,
    )
    if children:
        overrides["max_children"] = int(children)
    sp_cfg = selfplay_preset("net6_simhash", **overrides)
    sp = SelfplayEngine(eng, sp_cfg, evaluator)
    sp.reset(jax.random.PRNGKey(0))
    envs, tree = sp.envs, sp.tree

    # Warmup (compile). NOTE: under the axon remote backend,
    # block_until_ready does not await remote execution — a host transfer
    # does; the packed buffer transfer below is also exactly the readback
    # the driver performs each move.
    envs, tree, packed, _ = sp._move(envs, tree, bundle, jax.random.PRNGKey(1))
    np.asarray(packed)

    per_move = []
    t0 = time.perf_counter()
    for i in range(moves):
        t1 = time.perf_counter()
        envs, tree, packed, _ = sp._move(
            envs, tree, bundle, jax.random.PRNGKey(2 + i)
        )
        np.asarray(packed)
        per_move.append(time.perf_counter() - t1)
    dt = time.perf_counter() - t0
    if verbose:
        print(
            "per-move s: " + " ".join(f"{t:.3f}" for t in per_move),
            file=sys.stderr,
        )

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
                "unit": (
                    f"simulations/s (batch={batch}, k={sampled}, "
                    f"budget={budget}, {blocks}x{filters} net, "
                    f"C={sp_cfg.max_children}, reuse={int(reuse)}, "
                    f"{'trained ckpt' if ckpt_path else 'random init'}; "
                    "full driver move program)"
                ),
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
