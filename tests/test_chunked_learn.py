"""Chunked training path: `make_train_step_chunk` (K steps per dispatch).

The chunked step is the remote-accelerator throughput path of the learn
driver (drivers/learn.py --chunk-steps); it must be bit-identical to K
sequential `make_train_step` calls, and the driver must keep its exact
checkpoint cadence when chunking.
"""

import json

import numpy as np

import jax

from takzero_tpu.models.agent import new_agent
from takzero_tpu.models.network import NetConfig
from takzero_tpu.tak import engine
from takzero_tpu.train.data import make_batch, random_pretraining_targets
from takzero_tpu.train.learner import (
    init_opt,
    make_optimizer,
    make_train_step,
    make_train_step_chunk,
)

CFG = NetConfig(n=3, half_komi=0, filters=8, blocks=1, novelty="simhash", hash_bits=10)


def _batches(eng, k, b, seed):
    rng = np.random.default_rng(seed)
    return [
        make_batch(eng, random_pretraining_targets(eng, b, rng), rng)
        for _ in range(k)
    ]


def test_chunk_matches_sequential():
    eng = engine(3, half_komi=0)
    tx = make_optimizer()
    bundle = new_agent(CFG, seed=0)
    opt = init_opt(CFG, tx, bundle)
    chunks = _batches(eng, 3, 4, seed=7)

    step = jax.jit(make_train_step(CFG, tx), static_argnames=("train_ube",))
    b_seq, o_seq = bundle, opt
    seq_metrics = []
    for batch in chunks:
        b_seq, o_seq, m = step(b_seq, o_seq, batch, train_ube=True)
        seq_metrics.append(jax.tree.map(float, m))

    chunk = jax.jit(make_train_step_chunk(CFG, tx), static_argnames=("train_ube",))
    stacked = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *chunks)
    b_ch, o_ch, m_ch = chunk(bundle, opt, stacked, train_ube=True)

    for k in seq_metrics[0]:
        np.testing.assert_allclose(
            np.asarray(m_ch[k]),
            np.array([m[k] for m in seq_metrics]),
            rtol=1e-5,
            err_msg=k,
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), rtol=1e-4, atol=1e-6
        ),
        jax.tree.map(np.asarray, b_seq["params"]),
        jax.tree.map(np.asarray, b_ch["params"]),
    )
    # Novelty bitset identical (exact integer state).
    np.testing.assert_array_equal(
        np.asarray(b_seq["hash_bits"]), np.asarray(b_ch["hash_bits"])
    )


def test_learn_driver_chunked(tmp_path):
    """--chunk-steps > 1 trains, logs per-step metrics, keeps cadence."""
    from takzero_tpu.drivers import learn as learn_driver
    from takzero_tpu.drivers import selfplay as selfplay_driver

    d = str(tmp_path)
    learn_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "1",
            "--batch-size", "8", "--pretrain-targets", "32",
            "--pretrain-steps", "1", "--max-steps", "0", "--no-wait",
        ]
    )
    selfplay_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "2",
            "--batch", "4", "--budget", "16", "--sampled", "4",
            "--max-steps", "40",
        ]
    )
    learn_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "3",
            "--batch-size", "8", "--pretrain-steps", "0",
            "--max-steps", "4", "--no-wait", "--chunk-steps", "2",
        ]
    )
    steps = [
        json.loads(line)["step"]
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    # Pretrain logged nothing to metrics.jsonl; main loop logged 2..5
    # consecutively (chunked dispatch still emits one record per step).
    assert steps == sorted(steps) and len(set(steps)) == len(steps)
    assert len(steps) >= 4
    assert (tmp_path / "model_latest.ckpt").exists()


def test_latest_poller_reloads_only_on_change(tmp_path):
    """LatestPoller: no-op without a file, loads on change, skips when same."""
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.utils import ckpt

    cfg = CFG
    b0 = new_agent(cfg, seed=0)
    b1 = new_agent(cfg, seed=1)
    poller = ckpt.LatestPoller(tmp_path)

    cur, reloaded = poller.reload_if_changed(b0)
    assert not reloaded

    ckpt.save_checkpoint(tmp_path, "model_latest.ckpt", b1)
    cur, reloaded = poller.reload_if_changed(b0)
    assert reloaded
    ref = np.asarray(b1["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"])
    got = np.asarray(cur["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, ref)

    cur2, reloaded = poller.reload_if_changed(cur)
    assert not reloaded and cur2 is cur

    ckpt.save_checkpoint(tmp_path, "model_latest.ckpt", b0)
    _, reloaded = poller.reload_if_changed(cur)
    assert reloaded


def test_async_saver_orders_writes_and_drains(tmp_path):
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.utils import ckpt

    b0 = new_agent(CFG, seed=0)
    b1 = new_agent(CFG, seed=1)
    saver = ckpt.AsyncSaver()
    # Same target written twice: the later submit must win.
    saver.submit(tmp_path, "model_latest.ckpt", b0)
    saver.submit(tmp_path, "model_latest.ckpt", b1)
    saver.submit_latest_and_step(tmp_path, 100, b1)  # latest + no 50k ckpt
    saver.drain()
    # latest is weights-only per the hash-log protocol (ckpt.HASH_LOG).
    got = ckpt.load_checkpoint(
        tmp_path / "model_latest.ckpt", ckpt.strip_hash_bits(b0)
    )
    ref = np.asarray(b1["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(got["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"]), ref
    )
    assert not (tmp_path / "model_0000100.ckpt").exists()
    saver.submit_latest_and_step(
        tmp_path, 200, b0, steps_per_save=100, steps_per_checkpoint=200
    )
    saver.drain()
    assert (tmp_path / "model_0000200.ckpt").exists()


def test_async_saver_surfaces_write_failures(tmp_path):
    """A failed background save raises at the next submit (not silently)."""
    import pytest

    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.utils import ckpt

    b = new_agent(CFG, seed=0)
    saver = ckpt.AsyncSaver()
    bad = tmp_path / "not-a-dir-parent" / "x" / "deep"
    bad.parent.mkdir(parents=True)
    bad.write_text("file, not a directory")  # save into a FILE path fails
    saver.submit(bad, "model_latest.ckpt", b)
    with pytest.raises(Exception):
        saver.drain()
    # Errors cleared after raising; the saver keeps working.
    saver.submit(tmp_path, "model_latest.ckpt", b)
    saver.drain()
    assert (tmp_path / "model_latest.ckpt").exists()


def test_async_saver_coalesces_same_name(tmp_path):
    """Re-submitting a still-queued name replaces the snapshot (newest
    wins) instead of queueing unbounded bundles."""
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.utils import ckpt

    bundles = [new_agent(CFG, seed=i) for i in range(4)]
    saver = ckpt.AsyncSaver()
    for b in bundles:
        saver.submit(tmp_path, "model_latest.ckpt", b)
    saver.drain()
    got = ckpt.load_checkpoint(tmp_path / "model_latest.ckpt", bundles[0])
    ref = np.asarray(bundles[-1]["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(got["params"]["core"]["ConvBN_0"]["Conv_0"]["kernel"]), ref
    )


def test_chunk_len_respects_unaligned_checkpoint_cadence():
    """--steps-per-checkpoint cadences not aligned to steps_per_save must
    still land exactly (regression: clamping only to steps_per_save made
    `model_steps % 250 == 0` unreachable with --chunk-steps 20, silently
    skipping every immutable checkpoint)."""
    from takzero_tpu.config import LearnConfig
    from takzero_tpu.drivers.learn import chunk_len

    cfg = LearnConfig(steps_per_save=100, steps_per_checkpoint=250)
    hits_ckpt, hits_save, steps = set(), set(), 0
    while steps < 1200:
        c = chunk_len(
            steps, 20, cfg, cross_reanalyze=True, target_steps=1200
        )
        steps += c
        if steps % cfg.steps_per_checkpoint == 0:
            hits_ckpt.add(steps)
        if steps % cfg.steps_per_save == 0:
            hits_save.add(steps)
    assert steps == 1200
    assert hits_ckpt == {250, 500, 750, 1000}
    assert {100, 200, 300, 1100}.issubset(hits_save)
