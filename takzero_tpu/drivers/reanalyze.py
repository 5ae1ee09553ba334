"""Reanalyze actor driver.

Replaces the reference's reanalyze binary (reanalyze/src/main.rs):
backpressure on the reanalyze buffer, reload ``model_latest.ckpt``,
tail-read ``replays.txt`` exploding every replay into all its positions,
sample a batch, Gumbel-SH with beta=0, append fresh targets to
``targets-reanalyze.txt``.

Usage:
    python -m takzero_tpu.drivers.reanalyze --directory DIR [--net ...]
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import numpy as np

from ..config import NET_PRESETS, ReanalyzeConfig
from ..data import native_loader as nl
from ..data.buffer import PositionBuffer
from ..models.agent import make_net_evaluate, new_agent
from ..parallel import coordinator as co
from ..parallel import mesh as pm
from ..reanalyze import build_targets, make_reanalyze_step
from ..tak import engine, state_to_tps
from ..tak.oracle import Oracle
from ..utils import ckpt

log = logging.getLogger("reanalyze")


def explode_replays(eng, lines: list[str]) -> list[np.ndarray]:
    """Every intermediate position of every replay as packed int64 rows
    (target.rs:205-212), via the native loader — no per-position Python."""
    if not lines:
        return []
    text = "\n".join(line.rstrip("\n") for line in lines) + "\n"
    states, _ = nl.parse_replay_positions(
        eng.n, eng.half_komi, eng.reversible_limit, text
    )
    packed = pack_rows(eng.n, states)
    return list(packed)


def pack_rows(n: int, states) -> np.ndarray:
    """Batched TakState (numpy) -> int64[P, state_size] rows."""
    s = n * n
    p = states.height.shape[0]
    buf = np.zeros((p, nl.state_size(n)), np.int64)
    buf[:, :s] = states.height
    owners = states.owner_lo.astype(np.uint64) | (
        states.owner_hi.astype(np.uint64) << np.uint64(32)
    )
    buf[:, s : 2 * s] = owners.astype(np.int64)
    buf[:, 2 * s : 3 * s] = states.tops
    buf[:, 3 * s : 3 * s + 4] = states.reserves.reshape(p, 4)
    buf[:, 3 * s + 4] = states.to_move
    buf[:, 3 * s + 5] = states.ply
    buf[:, 3 * s + 6] = states.reversible
    return buf


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--directory", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-steps", type=int, default=None, help="for tests")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--budget", type=int, default=None)
    parser.add_argument("--sampled", type=int, default=None)
    parser.add_argument("--min-positions", type=int, default=None)
    parser.add_argument(
        "--exploration-positions",
        type=int,
        default=0,
        help="positions per batch drawn from replays-exploration.txt "
        "(the reference's `exploration` feature, reanalyze:42-47,119-133)",
    )
    parser.add_argument("--exploration-buffer", type=int, default=128_000)
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="shard the position batch over the first N visible devices "
        "under a dp mesh, model replicated (same layout as "
        "drivers/selfplay.py --devices)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    # Launched via drivers/multihost.py: position batch sharded over the
    # global mesh; process 0 owns the tail reads (broadcast to keep every
    # process's sample stream identical) and all file writes.
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

    cfg = ReanalyzeConfig(
        batch_size=args.batch or ReanalyzeConfig.batch_size,
        search_budget=args.budget or ReanalyzeConfig.search_budget,
        sampled_actions=args.sampled or ReanalyzeConfig.sampled_actions,
        min_positions=(
            args.min_positions
            if args.min_positions is not None
            else ReanalyzeConfig.min_positions
        ),
    )
    net_cfg = NET_PRESETS[args.net]
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    mesh = None
    rep_sharding = None
    if args.devices:
        mesh = pm.driver_mesh(parser, args.devices, cfg.batch_size, log, "--batch")
        if multi:
            rep_sharding = pm.replicated(mesh)

    evaluator = make_net_evaluate(net_cfg, eng)
    # Same child capacity as the selfplay actor (256 at 6x6+,
    # config.selfplay_preset) — reanalyze searches the same positions and
    # must not truncate more often than selfplay does.
    max_children = max(cfg.max_children, 256 if net_cfg.n >= 6 else 0)
    oracle = Oracle(net_cfg.n, net_cfg.half_komi)
    step = jax.jit(
        make_reanalyze_step(
            eng,
            evaluator,
            cfg.sampled_actions,
            cfg.search_budget,
            max_children,
            cfg.max_depth,
            cfg.ube_target_beta,
        ),
        # Host fetch of the per-position search outputs needs every shard
        # addressable locally under multihost: reshard in-graph.
        **({} if rep_sharding is None else {"out_shardings": rep_sharding}),
    )

    bundle = new_agent(net_cfg, seed=args.seed)
    if mesh is not None:
        bundle = pm.replicate(mesh, bundle)
    poller = ckpt.LatestPoller(
        args.directory,
        sharding=None if mesh is None else pm.replicated(mesh),
    )
    positions = PositionBuffer(rng)
    tail = co.Tailer(args.directory, co.REPLAYS)
    expl_positions = PositionBuffer(rng, max_len=args.exploration_buffer)
    expl_tail = co.Tailer(args.directory, co.REPLAYS_EXPLORATION)
    steps = 0
    while args.max_steps is None or steps < args.max_steps:
        steps += 1
        max_wait = None if args.max_steps is None else 0.0
        if multi:
            co.coordinated_backpressure(
                multi, coord, args.directory, cfg.max_reanalyze_buffer, 1,
                max_wait,
            )
        else:
            co.wait_for_backpressure(
                args.directory, cfg.max_reanalyze_buffer, which=1,
                max_wait=max_wait,
            )
        bundle, _ = poller.reload_if_changed(bundle, log)

        lines = tail.read_new_lines() if coord else None
        if multi:
            lines = multi.broadcast_lines(lines)
        positions.extend(explode_replays(eng, lines))
        if args.exploration_positions:
            expl_lines = expl_tail.read_new_lines() if coord else None
            if multi:
                expl_lines = multi.broadcast_lines(expl_lines)
            expl_positions.extend(explode_replays(eng, expl_lines))
        if len(positions) < cfg.min_positions:
            if args.max_steps is not None:
                log.info("only %d positions, stopping (test mode)", len(positions))
                return
            log.info("only %d positions, sleeping 60s", len(positions))
            time.sleep(60)
            continue

        n_expl = min(args.exploration_positions, len(expl_positions))
        picks = positions.sample(cfg.batch_size - n_expl)
        if n_expl:
            picks = picks + expl_positions.sample(n_expl)
        rows = np.stack(picks)
        states = nl.unpack_states(net_cfg.n, rows)
        tps_batch = [
            state_to_tps(net_cfg.n, jax.tree.map(lambda x: x[i], states))
            for i in range(rows.shape[0])
        ]
        key, k = jax.random.split(key)
        t0 = time.time()
        batch_states = jax.tree.map(jax.numpy.asarray, states)
        if mesh is not None:
            batch_states = pm.shard_batch(mesh, batch_states)
        _, pol, child_actions, ube, value, incomplete = step(
            batch_states, bundle, k
        )
        targets = build_targets(
            net_cfg.n, tps_batch, pol, child_actions, ube, value,
            incomplete=incomplete, oracle=oracle,
        )
        if coord:
            co.append_lines(
                args.directory, co.TARGETS_REANALYZE, [t.to_line() for t in targets]
            )
        log.info("step %d: %d targets in %.2fs", steps, len(targets), time.time() - t0)


if __name__ == "__main__":
    main()
