"""Co-scheduled actor+learner driver (drivers/coscheduled.py).

One process, one mesh: the train step's replicated output params feed the
next search step directly (SURVEY.md §5.8 "weights broadcast over ICI"),
while the filesystem protocol files are still produced for fleet interop.
"""


import numpy as np
from flax import serialization

from takzero_tpu.drivers import coscheduled
from takzero_tpu.models.agent import new_agent
from takzero_tpu.parallel import coordinator as co
from takzero_tpu.utils import ckpt

import pytest

pytestmark = pytest.mark.slow


def run(tmp_path, extra):
    coscheduled.main([
        "--directory", str(tmp_path), "--net", "tiny3", "--seed", "3",
        "--batch", "4", "--budget", "16", "--sampled", "4",
        "--batch-size", "8", "--steps-per-move", "2", "--max-moves", "40",
        *extra,
    ])


def check_artifacts(tmp_path):
    # Fleet-protocol files: targets, replays, buffer lengths, checkpoints.
    assert (tmp_path / co.TARGETS_SELFPLAY).exists()
    assert (tmp_path / co.REPLAYS).exists()
    assert (tmp_path / "buffer_lengths.txt").exists()
    # Training happened: the final step checkpoint is numbered > 0 and its
    # weights differ from init.
    resume = ckpt.model_path_with_most_steps(tmp_path)
    assert resume is not None and resume[0] > 0
    raw = serialization.msgpack_restore(
        (tmp_path / "model_latest.ckpt").read_bytes()
    )
    assert "hash_bits" not in raw  # weights-only latest (hash-log protocol)
    init = new_agent(coscheduled.NET_PRESETS["tiny3"], seed=3)
    trained = ckpt.load_checkpoint(resume[1], init)
    leaf0 = lambda b: np.asarray(  # noqa: E731
        next(iter(jax_leaves(b["params"])))
    )
    assert not np.array_equal(leaf0(trained), leaf0(init))
    return resume[0]


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_coscheduled_single_device(tmp_path):
    run(tmp_path, [])
    check_artifacts(tmp_path)


def test_coscheduled_reanalyze(tmp_path):
    """--reanalyze: the full reference topology in one process — random
    pre-training, selfplay targets, reanalyze joining at its position
    threshold, mixed 64+64 train batches after --steps-before-reanalyze."""
    run(tmp_path, [
        "--reanalyze", "--reanalyze-min-positions", "16",
        "--reanalyze-batch", "8", "--steps-before-reanalyze", "4",
        "--pretrain-steps", "2", "--pretrain-targets", "32",
    ])
    steps = check_artifacts(tmp_path)
    assert steps > 4, "expected training past the reanalyze switch-on"
    assert (tmp_path / co.TARGETS_INITIAL).exists()  # pre-training targets
    re_lines = (tmp_path / co.TARGETS_REANALYZE).read_text().splitlines()
    assert re_lines, "reanalyze produced no targets"
    # Reanalyze target lines carry the reference wire format (parseable
    # by the same validator the learner uses).
    from takzero_tpu.data.native_loader import valid_target_lines

    assert len(valid_target_lines(3, re_lines)) == len(re_lines)


def test_coscheduled_mesh(tmp_path):
    """Same driver sharded over 2 of the virtual CPU devices."""
    run(tmp_path, ["--devices", "2"])
    steps = check_artifacts(tmp_path)
    # The hash log covers every trained batch (flushed at exit): replaying
    # it reproduces the step checkpoint's embedded bitset exactly.
    full = ckpt.load_checkpoint(
        ckpt.model_path_with_most_steps(tmp_path)[1],
        new_agent(coscheduled.NET_PRESETS["tiny3"], seed=3),
    )
    from takzero_tpu.ops.bitset import bitset_init, bitset_set

    idx, _ = ckpt.read_hash_indices(tmp_path / ckpt.HASH_LOG, 0)
    replay = bitset_set(
        bitset_init(coscheduled.NET_PRESETS["tiny3"].hash_bits),
        idx.astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(replay), np.asarray(full["hash_bits"])
    )
    assert steps > 0
