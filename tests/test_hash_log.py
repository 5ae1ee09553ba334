"""Hash-log protocol: weights-only latest + append-only bitset deltas.

The learner publishes ``model_latest.ckpt`` without the novelty bitset
and streams new bit indices into ``hash_log.bin``; actors keep their
bitset device-resident and OR in the deltas (utils/ckpt.py LatestPoller).
Replaying the log must reconstruct the learner's bitset exactly.
"""

import jax
import numpy as np
from flax import serialization

from takzero_tpu.config import NET_PRESETS
from takzero_tpu.models.agent import new_agent
from takzero_tpu.ops.bitset import bitset_init, bitset_set
from takzero_tpu.utils import ckpt

TINY = NET_PRESETS["tiny3"]


def test_append_read_roundtrip(tmp_path):
    idx1 = np.asarray([5, 99, 5, 2**12 - 1], np.uint32)
    idx2 = np.asarray([17], np.uint32)
    ckpt.append_hash_indices(tmp_path, idx1)
    got, off = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, 0)
    np.testing.assert_array_equal(got, idx1)
    ckpt.append_hash_indices(tmp_path, idx2)
    got2, off2 = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, off)
    np.testing.assert_array_equal(got2, idx2)
    # Torn trailing write: partial uint32 is ignored until completed.
    with open(tmp_path / ckpt.HASH_LOG, "ab") as f:
        f.write(b"\x01\x02")
    got3, off3 = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, off2)
    assert got3.size == 0 and off3 == off2


def test_reconcile_appends_missing_bits(tmp_path):
    bits = bitset_init(12)
    all_idx = np.asarray([3, 64, 65, 4000], np.uint32)
    bits = bitset_set(bits, all_idx)
    ckpt.append_hash_indices(tmp_path, all_idx[:2])  # log is behind
    n = ckpt.reconcile_hash_log(tmp_path, np.asarray(bits))
    assert n == 2
    idx, _ = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, 0)
    replay = bitset_set(bitset_init(12), idx.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(replay), np.asarray(bits))
    # Idempotent: a second reconcile appends nothing.
    assert ckpt.reconcile_hash_log(tmp_path, np.asarray(bits)) == 0


def test_poller_applies_deltas_and_weights_only_latest(tmp_path):
    b0 = new_agent(TINY, seed=0)
    b1 = new_agent(TINY, seed=1)  # different weights to detect the reload

    ckpt.save_checkpoint(tmp_path, "model_latest.ckpt", ckpt.strip_hash_bits(b1))
    raw = serialization.msgpack_restore(
        (tmp_path / "model_latest.ckpt").read_bytes()
    )
    assert "hash_bits" not in raw  # weights-only on disk
    ckpt.append_hash_indices(tmp_path, np.asarray([7, 130], np.uint32))

    poller = ckpt.LatestPoller(tmp_path)
    bundle, reloaded = poller.reload_if_changed(b0)
    assert reloaded
    # Weights came from the file; bitset was reconstructed from the log.
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(bundle["params"])[0]),
        np.asarray(jax.tree.leaves(b1["params"])[0]),
    )
    want = bitset_set(bitset_init(TINY.hash_bits), np.asarray([7, 130], np.uint32))
    np.testing.assert_array_equal(np.asarray(bundle["hash_bits"]), np.asarray(want))

    # Delta-only poll: no weights change, new log entries still applied.
    ckpt.append_hash_indices(tmp_path, np.asarray([31], np.uint32))
    bundle, changed = poller.reload_if_changed(bundle)
    assert changed
    want = bitset_set(want, np.asarray([31], np.uint32))
    np.testing.assert_array_equal(np.asarray(bundle["hash_bits"]), np.asarray(want))

    # Quiet poll: nothing changed.
    bundle, changed = poller.reload_if_changed(bundle)
    assert not changed


def test_learn_driver_streams_hash_log(tmp_path):
    """The tiny learn driver writes a weights-only latest, and replaying
    hash_log.bin reproduces the bitset its own training accumulated."""
    from takzero_tpu.drivers import learn as learn_driver

    learn_driver.main([
        "--directory", str(tmp_path), "--net", "tiny3", "--seed", "1",
        "--batch-size", "8", "--pretrain-targets", "32",
        "--pretrain-steps", "2", "--max-steps", "0", "--no-wait",
    ])
    assert (tmp_path / ckpt.HASH_LOG).exists()
    raw = serialization.msgpack_restore(
        (tmp_path / "model_latest.ckpt").read_bytes()
    )
    assert "hash_bits" not in raw

    # The pretrain step checkpoint embeds the full bitset; the log replay
    # must reproduce it exactly (both cover exactly the pretrain batches).
    step_ckpts = sorted(tmp_path.glob("model_0*.ckpt"))
    full = ckpt.load_checkpoint(step_ckpts[-1], new_agent(TINY, seed=1))
    idx, _ = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, 0)
    assert idx.size > 0
    replay = bitset_set(bitset_init(TINY.hash_bits), idx.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(replay), np.asarray(full["hash_bits"]))


def test_fresh_indices_bound_the_log(tmp_path):
    """Producers log only newly set bits: retraining the same positions
    appends nothing, so hash_log.bin is bounded by distinct bits."""
    from takzero_tpu.models.agent import hash_indices_fresh, hash_update
    from takzero_tpu.tak import engine as make_engine
    from takzero_tpu.eee.harness import random_plane_batch

    eng = make_engine(TINY.n, half_komi=TINY.half_komi)
    bundle = new_agent(TINY, seed=0)
    planes = random_plane_batch(eng, jax.random.PRNGKey(0), 4, 16)

    idx, fresh = hash_indices_fresh(TINY, bundle, planes)
    first = ckpt.fresh_indices(idx, fresh)
    assert first.size > 0
    assert np.unique(first).size == first.size  # deduped within a batch

    bundle = hash_update(TINY, bundle, planes)  # the train step's set
    idx2, fresh2 = hash_indices_fresh(TINY, bundle, planes)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    assert ckpt.fresh_indices(idx2, fresh2).size == 0  # nothing new to log

    # Replaying the (bounded) log still reconstructs the bitset exactly.
    ckpt.append_hash_indices(tmp_path, first)
    got, _ = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, 0)
    replay = bitset_set(bitset_init(TINY.hash_bits), got.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(replay), np.asarray(bundle["hash_bits"]))


def test_poller_reload_keeps_bitset_device_resident(tmp_path):
    """A weights-only reload must not re-place the bitset leaf: in
    multihost mode that would round-trip ~512 MiB through host numpy on
    every model change (the exact cost the hash-log protocol removes)."""
    b0 = new_agent(TINY, seed=0)
    b1 = new_agent(TINY, seed=1)
    ckpt.save_checkpoint(tmp_path, "model_latest.ckpt", ckpt.strip_hash_bits(b1))
    poller = ckpt.LatestPoller(tmp_path)
    bits_before = b0["hash_bits"]
    bundle, reloaded = poller.reload_if_changed(b0)
    assert reloaded
    assert bundle["hash_bits"] is bits_before  # same device array, untouched
