"""Selfplay actor driver.

Replaces the reference's selfplay binary (selfplay/src/main.rs): an
infinite loop that (1) backpressure-waits on ``buffer_lengths.txt``,
(2) reloads ``model_latest.ckpt``, (3) plays one Gumbel-SH move across the
game batch, (4) appends finished targets/replays to the shared files.

Usage:
    python -m takzero_tpu.drivers.selfplay --directory DIR \
        [--net net6_simhash] [--exploration] [--seed N] [--max-steps N]
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import numpy as np

from ..config import MAX_SELFPLAY_BUFFER_LEN, NET_PRESETS, selfplay_preset
from ..models.agent import make_net_evaluate, new_agent
from ..parallel import coordinator as co
from ..parallel import mesh as pm
from ..selfplay import SelfplayEngine
from ..tak import engine
from ..utils import ckpt
from ..utils.profile import StepTrace

log = logging.getLogger("selfplay")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--directory", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--exploration", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None, help="for tests")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--budget", type=int, default=None)
    parser.add_argument("--sampled", type=int, default=None)
    parser.add_argument(
        "--fresh-tree",
        action="store_true",
        help="disable cross-move tree reuse (reference descends the chosen "
        "subtree between moves; this restores round-1 fresh-tree behavior)",
    )
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="shard the game batch (env + tree arrays) over the first N "
        "visible devices under a dp mesh, model replicated — the in-chip "
        "analog of the reference's actor fleet (SURVEY.md §2.5/§5.7)",
    )
    parser.add_argument(
        "--dump-search",
        default=None,
        help="append per-move root action dumps (game 0) to this file "
        "for tools/analyze_search.py",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="write a JAX profiler (xplane) trace of the steady-state move "
        "loop to DIR: the first move (compilation) is skipped, the next 3 "
        "moves are traced (SURVEY.md §5.1)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    # Launched via drivers/multihost.py: the game batch is sharded over
    # the global mesh; every process runs the identical collective move
    # step and host bookkeeping, process 0 owns all file writes
    # (parallel/multihost.py).  Model reload and hash-log polling key off
    # shared-FS stat/offsets, so processes agree up to a one-move skew —
    # harmless for data generation and self-healing on the next poll.
    multi = None
    if jax.process_count() > 1:
        from ..parallel import multihost as multi

        if args.devices is None:
            args.devices = len(jax.devices())
        log.info(
            "multihost: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    coord = multi is None or multi.is_coordinator()

    seed = args.seed if args.seed is not None else np.random.SeedSequence().entropy
    seed %= 2**31  # broadcast_scalar carries int32; keep launch modes identical
    if multi:
        # Lockstep lanes need one shared RNG stream.
        seed = multi.broadcast_scalar(seed)
    log.info("seed = %s", seed)
    key = jax.random.PRNGKey(seed)

    net_cfg = NET_PRESETS[args.net]
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    overrides = {"exploration": args.exploration}
    if args.batch:
        overrides["batch"] = args.batch
    if args.budget:
        overrides["search_budget"] = args.budget
    if args.sampled:
        overrides["sampled_actions"] = args.sampled
    if args.fresh_tree:
        overrides["tree_reuse"] = False
    sp_cfg = selfplay_preset(args.net, **overrides)

    mesh = None
    if args.devices:
        mesh = pm.driver_mesh(parser, args.devices, sp_cfg.batch, log, "--batch")

    evaluator = make_net_evaluate(net_cfg, eng)
    rep_fetch = None
    if multi and mesh is not None:
        rep_fetch = pm.replicated(mesh)
    sp = SelfplayEngine(eng, sp_cfg, evaluator, replicate_fetch=rep_fetch)
    key, k0 = jax.random.split(key)
    sp.reset(k0)
    if mesh is not None:
        # Env and tree arrays are batch-leading; the jitted move step
        # propagates these shardings (GSPMD all-gathers the novelty-bitset
        # updates, everything else stays lane-local).
        sp.envs = pm.shard_batch(mesh, sp.envs)
        sp.tree = pm.shard_batch(mesh, sp.tree)

    bundle = new_agent(net_cfg, seed=int(seed))
    rep = None
    if mesh is not None:
        rep = pm.replicated(mesh)
        bundle = pm.replicate(mesh, bundle)
    poller = ckpt.LatestPoller(args.directory, sharding=rep)
    steps = 0
    trace = StepTrace(args.profile if coord else None, log)
    while args.max_steps is None or steps < args.max_steps:
        trace.step()
        steps += 1
        start = time.time()
        # Backpressure + model reload-on-change (selfplay:89-125).
        max_wait = None if args.max_steps is None else 0.0
        if multi:
            co.coordinated_backpressure(
                multi, coord, args.directory, MAX_SELFPLAY_BUFFER_LEN, 0,
                max_wait,
            )
        else:
            co.wait_for_backpressure(
                args.directory, MAX_SELFPLAY_BUFFER_LEN, which=0,
                max_wait=max_wait,
            )
        bundle, reloaded = poller.reload_if_changed(bundle, log)
        if reloaded:
            log.info("reloaded model_latest (%.2fs)", time.time() - start)

        key, k_move = jax.random.split(key)
        targets, replays, exploration_replays = sp.play_move(bundle, k_move)
        if args.dump_search and coord:
            from ..selfplay import dump_root_line

            # last_root stays on device unless dumping is enabled.
            root_host = jax.tree.map(np.asarray, sp.last_root)
            with open(args.dump_search, "a", encoding="utf-8") as f:
                f.write(dump_root_line(net_cfg.n, root_host) + "\n")
        log.info(
            "step %d: move for %d games in %.2fs; %d targets, %d replays",
            steps, sp_cfg.batch, time.time() - start, len(targets), len(replays),
        )
        if steps % 100 == 0 or steps == args.max_steps:
            exp, inc = sp.truncation_totals
            log.info(
                "truncation: %d/%d nodes incomplete (%.4f%%) — loss/draw "
                "proofs are exact at the other %.4f%%",
                inc, exp, 100.0 * inc / max(exp, 1),
                100.0 - 100.0 * inc / max(exp, 1),
            )
        # On append failure the content is dumped into the log instead of
        # lost (reference selfplay/src/main.rs:332-344).
        for name, items in (
            (co.TARGETS_SELFPLAY, targets),
            (co.REPLAYS, replays),
            (co.REPLAYS_EXPLORATION, exploration_replays),
        ):
            if not items or not coord:
                continue
            lines = [x.to_line() for x in items]
            try:
                co.append_lines(args.directory, name, lines)
            except OSError as e:
                log.error("cannot append to %s (%s); dumping:\n%s",
                          name, e, "\n".join(lines))
    trace.stop()


if __name__ == "__main__":
    main()
