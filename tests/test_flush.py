"""utils/flush.py: packed one-buffer host readback round-trips.

The learner flush packs metric leaves + the hash (indices, fresh) pair
into ONE uint32 vector per chunk (pack_flush/unpack_flush) and drains
accumulated index pairs in grouped transfers (drain_index_pairs); these
tests pin bit-exact round-trips against the unpacked originals,
including the fresh-bit dedup semantics of ckpt.fresh_indices.
"""

import jax.numpy as jnp
import numpy as np

from takzero_tpu.utils import ckpt
from takzero_tpu.utils.flush import drain_index_pairs, pack_flush, unpack_flush


def test_pack_unpack_roundtrip_with_idx():
    rng = np.random.default_rng(0)
    c, n = 7, 96
    metrics = {
        "loss": jnp.asarray(rng.normal(size=c), jnp.float32),
        "loss_policy": jnp.asarray(rng.normal(size=c), jnp.float32),
        "loss_value": jnp.asarray(rng.normal(size=c), jnp.float32),
        "loss_ube": jnp.asarray(rng.normal(size=c), jnp.float32),
    }
    idx = jnp.asarray(rng.integers(0, 2**26, size=n), jnp.uint32)
    fresh = jnp.asarray(rng.integers(0, 2, size=n).astype(bool))
    buf = np.asarray(pack_flush(metrics, idx, fresh))
    m, new_idx = unpack_flush(buf, list(metrics), c, True)
    for k in metrics:
        np.testing.assert_array_equal(m[k], np.asarray(metrics[k]))
    expect = ckpt.fresh_indices(idx, fresh)
    np.testing.assert_array_equal(new_idx, expect)


def test_pack_unpack_metrics_only():
    metrics = {"a": jnp.asarray([1.5, -2.0], jnp.float32),
               "b": jnp.asarray([0.0, 3.25], jnp.float32)}
    buf = np.asarray(pack_flush(metrics))
    m, new_idx = unpack_flush(buf, ["b", "a"], 2, False)
    assert new_idx is None
    np.testing.assert_array_equal(m["a"], [1.5, -2.0])
    np.testing.assert_array_equal(m["b"], [0.0, 3.25])


def test_drain_index_pairs_matches_per_pair_fetch():
    rng = np.random.default_rng(1)
    pairs = []
    for _ in range(9):  # spans multiple groups at group=4
        idx = jnp.asarray(rng.integers(0, 1000, size=32), jnp.uint32)
        fresh = jnp.asarray(rng.integers(0, 2, size=32).astype(bool))
        pairs.append((idx, fresh))
    got = drain_index_pairs(pairs, group=4)
    expect = np.unique(
        np.concatenate([ckpt.fresh_indices(i, f) for i, f in pairs])
    ).astype("<u4")
    np.testing.assert_array_equal(got, expect)
    assert drain_index_pairs([]).shape == (0,)
