"""Learner driver.

Replaces the reference's learn binary (learn/src/main.rs): resume from the
highest-step checkpoint (or fresh init + pre-training on random games),
then loop: tail-read the two target files, publish buffer lengths, draw a
64+64 batch (reanalyze joins after step 5000), augment, one optimizer
step, save model_latest every 100 steps and an immutable checkpoint every
50000.

Usage:
    python -m takzero_tpu.drivers.learn --directory DIR [--net ...]
        [--restart-targets FILE] [--max-steps N]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from ..config import NET_PRESETS, LearnConfig
from ..data.buffer import TargetBuffer
from ..data.native_loader import make_batch_native, valid_target_lines
from ..models.agent import new_agent
from ..parallel import coordinator as co
from ..parallel import mesh as pm
from ..tak import engine
from ..train.data import make_batch, random_pretraining_targets
from ..utils.profile import StepTrace
from ..train.learner import (
    init_opt,
    make_optimizer,
    make_train_step,
    make_train_step_chunk,
)
from ..utils import ckpt
from ..utils import flush as fl

log = logging.getLogger("learn")


def chunk_len(
    model_steps: int,
    chunk_steps: int,
    cfg,
    cross_reanalyze: bool,
    target_steps: int | None,
) -> int:
    """Steps in the next dispatch chunk.

    Chunks never cross a save boundary, an immutable-checkpoint boundary
    (both stay exact-step even for cadences not aligned to each other —
    e.g. ``--chunk-steps 20 --steps-per-checkpoint 250``), the reanalyze
    switch-on, or the step target.
    """
    c = min(
        chunk_steps,
        cfg.steps_per_save - (model_steps % cfg.steps_per_save),
        cfg.steps_per_checkpoint - (model_steps % cfg.steps_per_checkpoint),
    )
    if not cross_reanalyze:
        c = min(c, cfg.steps_before_reanalyze - (model_steps + 1))
    if target_steps is not None:
        c = min(c, target_steps - model_steps)
    return max(c, 1)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--directory", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--restart-targets", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-steps", type=int, default=None, help="for tests")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--pretrain-targets", type=int, default=None)
    parser.add_argument("--pretrain-steps", type=int, default=None)
    parser.add_argument("--no-wait", action="store_true", help="for tests")
    parser.add_argument(
        "--steps-per-checkpoint", type=int, default=None,
        help="immutable checkpoint cadence (default 50000, learn/src/"
        "main.rs:45); lower it to give tools/elo_curve.py more points",
    )
    parser.add_argument(
        "--chunk-steps",
        type=int,
        default=None,
        help="optimizer steps per device dispatch (default 20; 1 with "
        "--no-wait). Chunks never cross a checkpoint boundary, so the "
        "save/normalization cadence is unchanged.",
    )
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="data-parallel training over the first N visible devices: "
        "target batch sharded over a dp mesh, params/optimizer state "
        "replicated, gradient all-reduce inserted by GSPMD (the TPU-native "
        "analog of the reference's per-GPU actor fleet, SURVEY.md §2.5)",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="write a JAX profiler (xplane) trace of the steady-state loop "
        "to DIR: the first chunk (compilation) is skipped, the next 3 "
        "chunks are traced (SURVEY.md §5.1)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    # Launched via drivers/multihost.py: every process runs this same
    # loop over a global mesh; process 0 owns all filesystem writes and
    # broadcasts its target-file reads so replicated params stay
    # bit-identical (parallel/multihost.py).
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

    cfg = LearnConfig(
        batch_size=args.batch_size or LearnConfig.batch_size,
        initial_random_targets=args.pretrain_targets
        or LearnConfig.initial_random_targets,
        # `or` would turn an explicit 0 into the default (1000 pretrain
        # steps on a run that asked for none).
        pre_training_steps=(
            args.pretrain_steps
            if args.pretrain_steps is not None
            else LearnConfig.pre_training_steps
        ),
        steps_per_checkpoint=args.steps_per_checkpoint
        or LearnConfig.steps_per_checkpoint,
    )
    net_cfg = NET_PRESETS[args.net]
    if net_cfg.novelty == "ensemble":
        # Reference parity: its learn binary never trains ensemble heads
        # either — they train only in the eee/ensemble experiment
        # (eee/src/ensemble.rs:320-339). Left at init here, the variance
        # across heads is a meaningless constant novelty signal.
        log.warning(
            "novelty='ensemble': the ensemble heads are NOT trained by this "
            "driver (train them via `eee ensemble`, matching the reference)"
        )
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    rng = np.random.default_rng(args.seed)

    mesh = None
    rep_sharding = None
    if args.devices:
        mesh = pm.driver_mesh(
            parser, args.devices, cfg.batch_size, log, "--batch-size"
        )
        if multi:
            # Host fetches (the packed flush buffer, hash indices) need
            # every shard addressable locally: replicated out_shardings.
            rep_sharding = pm.replicated(mesh)

    def place_batch(batch, batch_dim=0):
        """Shard a host batch over dp (no-op without --devices)."""
        if mesh is None:
            return batch
        return pm.shard_batch(mesh, batch, batch_dim=batch_dim)

    def place_replicated(tree):
        if mesh is None:
            return tree
        return pm.replicate(mesh, tree)

    tx = make_optimizer(cfg.learning_rate)
    train_step = jax.jit(make_train_step(net_cfg, tx), static_argnames=("train_ube",))
    # Chunked path: K steps per dispatch (jit recompiles per distinct K —
    # boundary-capped chunks produce at most a handful of lengths).
    chunk_steps = args.chunk_steps or (1 if args.no_wait else 20)
    train_chunk = jax.jit(
        make_train_step_chunk(net_cfg, tx), static_argnames=("train_ube",)
    )

    # Hash-novelty nets publish weights-only latest checkpoints plus an
    # append-only uint32 index log; actors reconstruct/extend their
    # device-resident bitset from the log (utils/ckpt.py HASH_LOG) instead
    # of re-downloading 512 MiB per reload.  The indices are recomputed
    # here from the batch planes — the projection constants never train,
    # so they match the in-graph hash_update bit-exactly.
    hash_logged = net_cfg.novelty in ("simhash", "lcghash")
    if hash_logged:
        from ..models.agent import hash_indices_fresh

        # (indices, fresh-mask) against the PRE-step bitset: only bits the
        # coming train step newly sets reach the log (ckpt.fresh_indices),
        # keeping hash_log.bin bounded by distinct positions.
        idx_fn = jax.jit(
            lambda b, p: hash_indices_fresh(
                net_cfg, b, p.reshape((-1,) + p.shape[-3:])
            ),
            **({} if rep_sharding is None else {"out_shardings": rep_sharding}),
        )
    else:
        idx_fn = None

    bundle = new_agent(net_cfg, seed=args.seed)
    opt_state = init_opt(net_cfg, tx, bundle)
    bundle, steps = ckpt.resume_with_hash_log(
        args.directory, bundle, log, reconcile=hash_logged and coord
    )
    if steps == 0 and coord:
        ckpt.save_checkpoint(args.directory, "model_0000000.ckpt", bundle)
    bundle = place_replicated(bundle)
    opt_state = place_replicated(opt_state)

    boot_idx: list = []

    if args.restart_targets:
        lines = valid_target_lines(
            net_cfg.n, open(args.restart_targets).read().splitlines()
        )
        rng.shuffle(lines)
        for i in range(0, len(lines) - cfg.batch_size + 1, cfg.batch_size):
            batch = place_batch(make_batch_native(
                eng, "\n".join(lines[i : i + cfg.batch_size]) + "\n", rng
            ))
            if idx_fn is not None:
                boot_idx.append(idx_fn(bundle, batch.planes))
            bundle, opt_state, _ = train_step(bundle, opt_state, batch, train_ube=False)
            steps += 1
        if coord:
            ckpt.save_checkpoint(args.directory, f"model_{steps:07d}.ckpt", bundle)
    elif steps == 0 and cfg.pre_training_steps > 0:
        log.info("pre-training on %d random targets", cfg.initial_random_targets)
        targets = random_pretraining_targets(eng, cfg.initial_random_targets, rng)
        if coord:
            co.append_lines(
                args.directory, co.TARGETS_INITIAL, [t.to_line() for t in targets]
            )
        rng.shuffle(targets)
        for i in range(cfg.pre_training_steps):
            chunk = targets[i * cfg.batch_size : (i + 1) * cfg.batch_size]
            if len(chunk) < cfg.batch_size:
                break
            batch = place_batch(make_batch(eng, chunk, rng))
            if idx_fn is not None:
                boot_idx.append(idx_fn(bundle, batch.planes))
            bundle, opt_state, m = train_step(bundle, opt_state, batch, train_ube=False)
            if i % 100 == 0:
                log.info("pretrain %d: %s", i, jax.tree.map(float, m))
            steps += 1
        if coord:
            ckpt.save_checkpoint(args.directory, f"model_{steps:07d}.ckpt", bundle)

    if boot_idx and coord:
        # Grouped single-buffer fetches (one per 64 steps) instead of two
        # blocking round-trips per pre-training step.
        ckpt.append_hash_indices(args.directory, fl.drain_index_pairs(boot_idx))
    if coord:
        ckpt.save_checkpoint(
            args.directory, "model_latest.ckpt", ckpt.strip_hash_bits(bundle)
        )

    # RND variants: fixed early/late reference batches drive the min/max
    # normalization refresh (learn/src/rnd_normalization.rs:48-77).
    rnd_refs = None
    if net_cfg.novelty == "rnd":
        from ..eee.harness import random_plane_batch
        from ..models.agent import rnd_update_normalization

        rnd_refs = (
            place_batch(
                random_plane_batch(eng, jax.random.PRNGKey(args.seed ^ 0xE), 8, 64)
            ),
            place_batch(
                random_plane_batch(eng, jax.random.PRNGKey(args.seed ^ 0xF), 60, 64)
            ),
        )
        rnd_norm = jax.jit(
            lambda b, e, l: rnd_update_normalization(net_cfg, b, e, l)
        )
        bundle = rnd_norm(bundle, *rnd_refs)

    sp_buffer = TargetBuffer(rng)
    re_buffer = TargetBuffer(rng)
    sp_tail = co.Tailer(args.directory, co.TARGETS_SELFPLAY)
    re_tail = co.Tailer(args.directory, co.TARGETS_REANALYZE)
    last_read = 0.0

    pending_metrics: list = []
    saver = ckpt.AsyncSaver()

    # One packed uint32 buffer per chunk = ONE blocking host fetch at
    # flush time (metric leaves + hash indices used to be ~6 round-trips
    # over the remote link; utils/flush.py).
    pack_fn = jax.jit(
        fl.pack_flush,
        **({} if rep_sharding is None else {"out_shardings": rep_sharding}),
    )

    last_flush = [0.0]

    def flush_metrics(item):
        """Fetch one chunk's packed flush buffer and log/record per step."""
        first_step, c, keys, packed, has_idx = item
        if not coord:
            return
        m_host, new_idx = fl.unpack_flush(np.asarray(packed), keys, c, has_idx)
        if new_idx is not None:
            ckpt.append_hash_indices(args.directory, new_idx)
        jsonl = []
        for i in range(c):
            step_i = first_step + i
            m = {k: float(v[i]) for k, v in m_host.items()}
            log.info(
                "step %d: loss=%.4f policy=%.4f value=%.4f ube=%.4f",
                step_i, m["loss"], m["loss_policy"], m["loss_value"], m["loss_ube"],
            )
            jsonl.append(json.dumps({"step": step_i, **m}))
        # Delivered throughput incl. host work (the jitted step alone is
        # not the number that matters for the actor fleet).
        now = time.time()
        if last_flush[0]:
            log.info(
                "chunk of %d flushed: %.1f steps/s end-to-end",
                c, c / max(now - last_flush[0], 1e-9),
            )
        last_flush[0] = now
        # Structured metrics alongside the logs (tools/logs.py reads both).
        co.append_lines(args.directory, "metrics.jsonl", jsonl)

    target_steps = None if args.max_steps is None else steps + args.max_steps
    model_steps = steps
    trace = StepTrace(args.profile if coord else None, log)
    while target_steps is None or model_steps < target_steps:
        trace.step()
        first = model_steps + 1
        using_reanalyze = (
            args.restart_targets is not None
            or first >= cfg.steps_before_reanalyze
        )
        c = chunk_len(
            model_steps, chunk_steps, cfg,
            cross_reanalyze=using_reanalyze,  # already covers restart_targets
            target_steps=target_steps,
        )

        while True:
            want_read = time.time() - last_read >= (
                0.0 if args.no_wait else cfg.min_seconds_between_reads
            )
            if multi:
                # Clock-gated decisions diverge across processes; follow
                # the coordinator so every process runs the same sequence
                # of (collective) broadcast reads.
                want_read = bool(multi.broadcast_scalar(want_read))
            if want_read:
                # Buffers hold raw validated lines; parsing happens natively
                # per batch (data/native_loader.py).  In multihost mode only
                # the coordinator tails the files; everyone receives the
                # same lines, keeping buffers/batches/params bit-identical.
                sp_lines = sp_tail.read_new_lines() if coord else None
                if multi:
                    sp_lines = multi.broadcast_lines(sp_lines)
                sp_buffer.extend(
                    valid_target_lines(net_cfg.n, sp_lines),
                    cfg.selfplay_forced_uses,
                    first,
                )
                if using_reanalyze:
                    re_lines = re_tail.read_new_lines() if coord else None
                    if multi:
                        re_lines = multi.broadcast_lines(re_lines)
                    re_buffer.extend(
                        valid_target_lines(net_cfg.n, re_lines),
                        cfg.reanalyze_forced_uses,
                        first,
                    )
                last_read = time.time()
                if coord:
                    co.write_buffer_lengths(
                        args.directory, len(sp_buffer), len(re_buffer)
                    )

            if args.no_wait:
                # Tests: fit the chunk to the available full batches.
                c = min(c, max(1, len(sp_buffer) // cfg.batch_size))
            # Worst case every drained entry is on its last forced use and
            # does not return to the buffer: gate on the chunk's FULL
            # consumption per stream (full batches when not mixing).
            need_sp = c * (
                cfg.batch_size // 2 if using_reanalyze else cfg.batch_size
            )
            need_re = c * (cfg.batch_size // 2)
            min_sp = (
                c * cfg.batch_size
                if args.no_wait
                else max(cfg.min_selfplay_buffer, need_sp)
            )
            min_re = (
                c * cfg.batch_size
                if args.no_wait
                else max(cfg.min_reanalyze_buffer, need_re)
            )
            enough_sp = len(sp_buffer) >= min_sp
            enough_re = not using_reanalyze or len(re_buffer) >= min_re
            if enough_sp and enough_re:
                break
            if args.no_wait:
                # Tests: degrade to selfplay-only batches.
                if enough_sp:
                    using_reanalyze = False
                    break
                trace.stop()
                for item in pending_metrics:
                    flush_metrics(item)
                if coord:
                    saver.submit(
                        args.directory,
                        "model_latest.ckpt",
                        ckpt.strip_hash_bits(bundle),
                    )
                saver.drain()
                return
            log.info(
                "not enough targets (sp=%d re=%d), sleeping %.0fs",
                len(sp_buffer), len(re_buffer), cfg.sleep_when_starved,
            )
            time.sleep(cfg.sleep_when_starved)

        t_a = time.perf_counter()
        drained: list = []
        for _ in range(c):
            if using_reanalyze:
                half = cfg.batch_size // 2
                drained += sp_buffer.drain_batch(half) + re_buffer.drain_batch(half)
            else:
                drained += sp_buffer.drain_batch(cfg.batch_size)
        t_b = time.perf_counter()
        chunk_idx = None
        if c == 1:
            batch = place_batch(
                make_batch_native(eng, "\n".join(drained) + "\n", rng)
            )
            if idx_fn is not None:
                chunk_idx = idx_fn(bundle, batch.planes)
            bundle, opt_state, metrics = train_step(
                bundle, opt_state, batch, train_ube=True
            )
            metrics = jax.tree.map(lambda x: jax.numpy.asarray(x)[None], metrics)
        else:
            # One parse + one device encode for the whole chunk — NOT one
            # per batch (see make_batch_native's splits note).
            batches = place_batch(
                make_batch_native(eng, "\n".join(drained) + "\n", rng, splits=c),
                batch_dim=1,
            )
            if idx_fn is not None:
                chunk_idx = idx_fn(bundle, batches.planes)
            bundle, opt_state, metrics = train_chunk(
                bundle, opt_state, batches, train_ube=True
            )
        # Defer the blocking metric fetch one chunk: the next iteration's
        # host-side batch assembly then overlaps this chunk's device
        # compute (dispatch is asynchronous).
        t_c = time.perf_counter()
        first_step = model_steps + 1
        model_steps += c
        packed = (
            pack_fn(metrics)
            if chunk_idx is None
            else pack_fn(metrics, *chunk_idx)
        )
        pending_metrics.append(
            (first_step, c, sorted(metrics), packed, chunk_idx is not None)
        )
        if len(pending_metrics) > 1:
            flush_metrics(pending_metrics.pop(0))
        if os.environ.get("TAKZERO_LEARN_TIMING"):
            log.info(
                "chunk timing: assemble=%.3fs stack+dispatch=%.3fs "
                "flush=%.3fs (c=%d)",
                t_b - t_a, t_c - t_b, time.perf_counter() - t_c, c,
            )
        if rnd_refs is not None and model_steps % 100 == 0:
            bundle = rnd_norm(bundle, *rnd_refs)
            log.info(
                "RND normalization: min=%.4f max=%.4f",
                float(bundle["rnd_min"]), float(bundle["rnd_max"]),
            )
        # Off-thread: fetching + writing the bundle every steps_per_save
        # would otherwise stall the dispatch loop.  Latest is weights-only
        # (actors track the bitset via the hash log); immutable step
        # checkpoints embed the full bitset for self-contained resume.
        if coord and model_steps % cfg.steps_per_save == 0:
            saver.submit(
                args.directory, "model_latest.ckpt", ckpt.strip_hash_bits(bundle)
            )
        if coord and model_steps % cfg.steps_per_checkpoint == 0:
            saver.submit(args.directory, f"model_{model_steps:07d}.ckpt", bundle)
    trace.stop()
    for item in pending_metrics:
        flush_metrics(item)
    # Always leave a final latest for downstream consumers (tests rely on it).
    if coord:
        saver.submit(
            args.directory, "model_latest.ckpt", ckpt.strip_hash_bits(bundle)
        )
    saver.drain()


if __name__ == "__main__":
    main()
