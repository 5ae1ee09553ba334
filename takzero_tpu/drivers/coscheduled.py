"""Co-scheduled actor+learner: weights broadcast over ICI, not files.

The reference decouples its 1 learner + 20 actors over a shared
filesystem — actors poll ``model_latest.ot`` and re-deserialize weights
(selfplay/src/main.rs:107-120; SURVEY.md §5.8).  On a TPU slice the
natural co-scheduled configuration puts the learner and a selfplay actor
in ONE jitted program set over ONE device mesh: the train step's updated
parameters stay device-resident with replicated sharding (GSPMD carries
them over ICI), and the very next search step reads them directly — the
"weights broadcast over ICI after each update epoch" path of SURVEY.md
§5.8, with zero serialization, zero staleness, and no polling.

Interop with the decoupled fleet is preserved: targets/replays are still
appended to the shared files, buffer lengths published, and
``model_latest.ckpt`` (weights-only) + ``hash_log.bin`` still written on
the usual cadence, so external reanalyze/evaluation/puzzle jobs can join
a co-scheduled run unchanged.  (The in-process novelty bitset needs no
log replay at all — search and training literally share the device
array.)

``--reanalyze`` folds the reference's third process into the same
schedule: replay positions are exploded in-process, and once the position
store reaches ``--reanalyze-min-positions`` (reanalyze/src/main.rs:38) one
fresh-tree β=0 reanalyze batch runs per selfplay move; after
``--steps-before-reanalyze`` optimizer steps (learn/src/main.rs:54-58) the
train batches switch to the reference's 64+64 selfplay+reanalyze mix —
the full learner/actor/reanalyze topology on one device mesh.
``--pretrain-steps`` reproduces the learner's random-playout pre-training
phase (learn/src/main.rs:139-171) before the loop starts.

Usage:
    python -m takzero_tpu.drivers.coscheduled --directory DIR
        [--net net6_simhash] [--devices N] [--steps-per-move K]
        [--max-moves N] [--batch B] [--budget N] [--sampled K]
        [--reanalyze] [--pretrain-steps N]
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import numpy as np

from ..config import NET_PRESETS, LearnConfig, selfplay_preset
from ..data.buffer import TargetBuffer
from ..data.native_loader import make_batch_native
from ..models.agent import make_net_evaluate, new_agent
from ..parallel import coordinator as co
from ..parallel import mesh as pm
from ..selfplay import SelfplayEngine
from ..tak import engine
from ..train.learner import init_opt, make_optimizer, make_train_step
from ..utils import ckpt
from ..utils.flush import drain_index_pairs

log = logging.getLogger("coscheduled")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--directory", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--budget", type=int, default=None)
    parser.add_argument("--sampled", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="learner batch size")
    parser.add_argument(
        "--steps-per-move", type=int, default=1,
        help="optimizer steps attempted after each selfplay move "
        "(skipped while the in-memory target buffer is short)",
    )
    parser.add_argument("--max-moves", type=int, default=None, help="for tests")
    parser.add_argument(
        "--steps-per-checkpoint", type=int, default=None,
        help="immutable checkpoint cadence (default 50000); lower it to "
        "give tools/elo_curve.py more points",
    )
    parser.add_argument(
        "--reanalyze", action="store_true",
        help="run the reanalyze actor in-process: one fresh-tree beta=0 "
        "batch per move once enough replay positions exist, mixed 64+64 "
        "into train batches after --steps-before-reanalyze",
    )
    parser.add_argument("--steps-before-reanalyze", type=int, default=None)
    parser.add_argument(
        "--reanalyze-min-positions", type=int, default=None,
        help="replay positions required before reanalyze starts "
        "(default 128000, reanalyze/src/main.rs:38)",
    )
    parser.add_argument("--reanalyze-batch", type=int, default=None)
    parser.add_argument(
        "--exploration", action="store_true",
        help="beta=0.25 on the first half of the selfplay batch (the "
        "reference's `exploration` cargo feature, selfplay/src/main.rs:81-87)",
    )
    parser.add_argument(
        "--pretrain-steps", type=int, default=0,
        help="pre-training optimizer steps on random-playout targets "
        "before the loop (learn/src/main.rs:139-171); 0 disables",
    )
    parser.add_argument("--pretrain-targets", type=int, default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    net_cfg = NET_PRESETS[args.net]
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    cfg = LearnConfig(
        batch_size=args.batch_size or LearnConfig.batch_size,
        steps_per_checkpoint=args.steps_per_checkpoint
        or LearnConfig.steps_per_checkpoint,
        steps_before_reanalyze=args.steps_before_reanalyze
        or LearnConfig.steps_before_reanalyze,
        pre_training_steps=args.pretrain_steps,
        initial_random_targets=args.pretrain_targets
        or LearnConfig.initial_random_targets,
    )
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    mesh = None
    if args.devices:
        mesh = pm.make_mesh(args.devices)
        log.info("co-scheduled over %d devices: %s", args.devices, mesh)

    overrides = {}
    if args.batch:
        overrides["batch"] = args.batch
    if args.budget:
        overrides["search_budget"] = args.budget
    if args.sampled:
        overrides["sampled_actions"] = args.sampled
    if args.exploration:
        overrides["exploration"] = True
    sp_cfg = selfplay_preset(args.net, **overrides)
    if args.devices and sp_cfg.batch % args.devices:
        parser.error(
            f"--batch {sp_cfg.batch} not divisible by --devices {args.devices}"
        )
    if args.devices and cfg.batch_size % args.devices:
        parser.error(
            f"--batch-size {cfg.batch_size} not divisible by "
            f"--devices {args.devices}"
        )

    evaluator = make_net_evaluate(net_cfg, eng)
    sp = SelfplayEngine(eng, sp_cfg, evaluator)
    key, k0 = jax.random.split(key)
    sp.reset(k0)
    if mesh is not None:
        sp.envs = pm.shard_batch(mesh, sp.envs)
        sp.tree = pm.shard_batch(mesh, sp.tree)

    tx = make_optimizer(cfg.learning_rate)
    train_step = jax.jit(
        make_train_step(net_cfg, tx), static_argnames=("train_ube",)
    )
    hash_logged = net_cfg.novelty in ("simhash", "lcghash")
    idx_fn = None
    if hash_logged:
        from ..models.agent import hash_indices_fresh

        # Pre-step (indices, fresh) pairs; only newly set bits reach the
        # log (ckpt.fresh_indices) so hash_log.bin stays bounded.
        idx_fn = jax.jit(lambda b, p: hash_indices_fresh(net_cfg, b, p))

    bundle = new_agent(net_cfg, seed=args.seed)
    opt_state = init_opt(net_cfg, tx, bundle)
    bundle, steps = ckpt.resume_with_hash_log(
        args.directory, bundle, log, reconcile=hash_logged
    )
    if steps == 0:
        # Fresh init (or idempotent rewrite when resuming from step 0).
        ckpt.save_checkpoint(args.directory, "model_0000000.ckpt", bundle)
    if mesh is not None:
        # Replicated over the mesh: every train-step update lands in this
        # sharding and the next play_move consumes it in place — this IS
        # the ICI weights broadcast (no host copy, no file, no poll).
        bundle = pm.replicate(mesh, bundle)
        opt_state = pm.replicate(mesh, opt_state)

    def place_batch(batch):
        if mesh is None:
            return batch
        return pm.shard_batch(mesh, batch)

    boot_idx: list = []
    if steps == 0 and cfg.pre_training_steps > 0:
        # Learner pre-training phase (learn/src/main.rs:139-171): random
        # playout targets, value+policy only (no UBE).
        from ..train.data import make_batch, random_pretraining_targets

        log.info(
            "pre-training %d steps on %d random targets",
            cfg.pre_training_steps, cfg.initial_random_targets,
        )
        pre = random_pretraining_targets(eng, cfg.initial_random_targets, rng)
        co.append_lines(
            args.directory, co.TARGETS_INITIAL, [t.to_line() for t in pre]
        )
        rng.shuffle(pre)
        for i in range(cfg.pre_training_steps):
            chunk = pre[i * cfg.batch_size : (i + 1) * cfg.batch_size]
            if len(chunk) < cfg.batch_size:
                break
            batch = place_batch(make_batch(eng, chunk, rng))
            if idx_fn is not None:
                boot_idx.append(idx_fn(bundle, batch.planes))
            bundle, opt_state, m = train_step(
                bundle, opt_state, batch, train_ube=False
            )
            if i % 100 == 0:
                log.info("pretrain %d: %s", i, jax.tree.map(float, m))
            steps += 1
        if boot_idx:
            # Grouped single-buffer fetches (utils/flush.py) instead of
            # two blocking round-trips per pre-training step.
            ckpt.append_hash_indices(
                args.directory, drain_index_pairs(boot_idx)
            )
        ckpt.save_checkpoint(args.directory, f"model_{steps:07d}.ckpt", bundle)

    buffer = TargetBuffer(rng)
    re_buffer = TargetBuffer(rng)
    re_cfg = None
    if args.reanalyze:
        from ..config import ReanalyzeConfig
        from ..data import native_loader as nl
        from ..data.buffer import PositionBuffer
        from ..reanalyze import build_targets, make_reanalyze_step
        from ..tak import state_to_tps
        from ..tak.oracle import Oracle
        from .reanalyze import explode_replays

        re_cfg = ReanalyzeConfig(
            batch_size=args.reanalyze_batch or ReanalyzeConfig.batch_size,
            search_budget=sp_cfg.search_budget,
            sampled_actions=sp_cfg.sampled_actions,
            min_positions=(
                args.reanalyze_min_positions
                if args.reanalyze_min_positions is not None
                else ReanalyzeConfig.min_positions
            ),
        )
        re_step = jax.jit(
            make_reanalyze_step(
                eng,
                evaluator,
                re_cfg.sampled_actions,
                re_cfg.search_budget,
                max(re_cfg.max_children, sp_cfg.max_children),
                re_cfg.max_depth,
                re_cfg.ube_target_beta,
            )
        )
        re_positions = PositionBuffer(rng)
        re_oracle = Oracle(net_cfg.n, net_cfg.half_komi)
        if steps > 0:
            # Crash/restart resume: the reference reanalyze re-tails
            # replays.txt from offset 0 (SURVEY.md §7 L7); reseed the
            # in-process position store from the tail of the shared file
            # so the 64+64 mix doesn't starve for ~min_positions moves.
            import pathlib

            rp = pathlib.Path(args.directory) / co.REPLAYS
            if rp.exists():
                lines = rp.read_text().splitlines()[-600:]
                if lines:
                    re_positions.extend(explode_replays(eng, lines))
                    log.info(
                        "reseeded %d reanalyze positions from %d stored "
                        "replays", len(re_positions), len(lines),
                    )
    saver = ckpt.AsyncSaver()
    moves = 0
    trained_lines: list = []
    while args.max_moves is None or moves < args.max_moves:
        moves += 1
        t0 = time.time()
        key, k_move = jax.random.split(key)
        targets, replays, exploration_replays = sp.play_move(bundle, k_move)
        lines = [t.to_line() for t in targets]
        buffer.extend(lines, cfg.selfplay_forced_uses, steps)
        replay_lines = [r.to_line() for r in replays]
        for name, items in (
            (co.TARGETS_SELFPLAY, lines),
            (co.REPLAYS, replay_lines),
            (
                co.REPLAYS_EXPLORATION,
                [r.to_line() for r in exploration_replays],
            ),
        ):
            if items:
                co.append_lines(args.directory, name, items)

        re_targets = 0
        if args.reanalyze:
            if replay_lines:
                re_positions.extend(explode_replays(eng, replay_lines))
            if (
                len(re_positions) >= re_cfg.min_positions
                and len(re_buffer) < re_cfg.max_reanalyze_buffer
            ):
                rows = np.stack(re_positions.sample(re_cfg.batch_size))
                states = nl.unpack_states(net_cfg.n, rows)
                tps_batch = [
                    state_to_tps(
                        net_cfg.n, jax.tree.map(lambda x, i=i: x[i], states)
                    )
                    for i in range(rows.shape[0])
                ]
                key, k_re = jax.random.split(key)
                batch_states = jax.tree.map(jax.numpy.asarray, states)
                if mesh is not None:
                    batch_states = pm.shard_batch(mesh, batch_states)
                _, pol, child_actions, ube, value, incomplete = re_step(
                    batch_states, bundle, k_re
                )
                re_lines = [
                    t.to_line()
                    for t in build_targets(
                        net_cfg.n, tps_batch, pol, child_actions, ube,
                        value, incomplete=incomplete, oracle=re_oracle,
                    )
                ]
                re_buffer.extend(re_lines, cfg.reanalyze_forced_uses, steps)
                co.append_lines(args.directory, co.TARGETS_REANALYZE, re_lines)
                re_targets = len(re_lines)

        t_move = time.time() - t0
        trained = 0
        for _ in range(args.steps_per_move):
            # After the reanalyze switch-on the reference learner only
            # trains on mixed 64+64 batches, sleeping while either stream
            # is starved (learn/src/main.rs:54-58) — here a starved stream
            # skips the step and selfplay/reanalyze continue filling.
            mix = args.reanalyze and steps + 1 >= cfg.steps_before_reanalyze
            if mix:
                half = cfg.batch_size // 2
                if len(buffer) < half or len(re_buffer) < half:
                    break
                drained = buffer.drain_batch(half) + re_buffer.drain_batch(
                    half
                )
            else:
                if len(buffer) < cfg.batch_size:
                    break
                drained = buffer.drain_batch(cfg.batch_size)
            batch = place_batch(make_batch_native(
                eng, "\n".join(drained) + "\n", rng
            ))
            if idx_fn is not None:
                trained_lines.append(idx_fn(bundle, batch.planes))
            bundle, opt_state, metrics = train_step(
                bundle, opt_state, batch, train_ube=True
            )
            steps += 1
            trained += 1
            at_save = steps % cfg.steps_per_save == 0
            at_ckpt = steps % cfg.steps_per_checkpoint == 0
            if (at_save or at_ckpt) and trained_lines:
                # Keep hash_log.bin at least as fresh as any artifact
                # written this step: external pollers replay the log to
                # track the bitset embedded in immutable checkpoints.
                ckpt.append_hash_indices(
                    args.directory, drain_index_pairs(trained_lines)
                )
                trained_lines.clear()
            if at_save:
                saver.submit(
                    args.directory, "model_latest.ckpt",
                    ckpt.strip_hash_bits(bundle),
                )
            if at_ckpt:
                saver.submit(args.directory, f"model_{steps:07d}.ckpt", bundle)
        co.write_buffer_lengths(args.directory, len(buffer), len(re_buffer))
        log.info(
            "move %d: %.2fs search (+%d train steps, %.2fs total); "
            "buffer=%d re_buffer=%d, %d targets, %d re-targets, "
            "%d replays, model step %d",
            moves, t_move, trained, time.time() - t0,
            len(buffer), len(re_buffer), len(targets), re_targets,
            len(replays), steps,
        )

    if trained_lines:
        ckpt.append_hash_indices(
            args.directory, drain_index_pairs(trained_lines)
        )
    saver.submit(
        args.directory, "model_latest.ckpt", ckpt.strip_hash_bits(bundle)
    )
    saver.submit(args.directory, f"model_{steps:07d}.ckpt", bundle)
    saver.drain()


if __name__ == "__main__":
    main()
