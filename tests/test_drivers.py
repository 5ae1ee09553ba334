"""Driver-level integration: selfplay -> learn -> reanalyze through the
shared-filesystem protocol, all in-process with tiny configs.

This exercises the full reference topology (SURVEY.md §5.8) — append-only
target/replay files, buffer_lengths backpressure, model_latest reloads —
without a cluster.
"""

import pathlib

import numpy as np
import pytest

from takzero_tpu.drivers import learn as learn_driver
from takzero_tpu.drivers import reanalyze as reanalyze_driver
from takzero_tpu.drivers import selfplay as selfplay_driver
from takzero_tpu.parallel import coordinator as co


@pytest.mark.slow
def test_full_loop(tmp_path):
    d = str(tmp_path)

    # 1. Learner initializes + pretrains briefly, writes model_latest.
    learn_driver.main(
        [
            "--directory", d,
            "--net", "tiny3",
            "--seed", "1",
            "--batch-size", "8",
            "--pretrain-targets", "32",
            "--pretrain-steps", "2",
            "--max-steps", "0",
            "--no-wait",
        ]
    )
    assert (tmp_path / "model_latest.ckpt").exists()
    assert (tmp_path / "model_0000000.ckpt").exists()
    assert (tmp_path / "targets-initial.txt").exists()

    # 2. Selfplay generates targets + replays against model_latest.
    selfplay_driver.main(
        [
            "--directory", d,
            "--net", "tiny3",
            "--seed", "2",
            "--batch", "4",
            "--budget", "16",
            "--sampled", "4",
            "--max-steps", "30",
        ]
    )
    targets_file = tmp_path / "targets-selfplay.txt"
    replays_file = tmp_path / "replays.txt"
    assert targets_file.exists() and targets_file.stat().st_size > 0
    assert replays_file.exists() and replays_file.stat().st_size > 0

    # 3. Learner trains on them.
    learn_driver.main(
        [
            "--directory", d,
            "--net", "tiny3",
            "--seed", "3",
            "--batch-size", "8",
            "--pretrain-steps", "0",
            "--max-steps", "2",
            "--no-wait",
        ]
    )
    lengths = co.read_buffer_lengths(d)
    assert lengths is not None and lengths[0] > 0

    # 4. Reanalyze produces fresh targets from the replays.
    reanalyze_driver.main(
        [
            "--directory", d,
            "--net", "tiny3",
            "--seed", "4",
            "--batch", "4",
            "--budget", "16",
            "--sampled", "4",
            "--min-positions", "4",
            "--max-steps", "2",
        ]
    )
    re_file = tmp_path / "targets-reanalyze.txt"
    assert re_file.exists() and re_file.stat().st_size > 0

    # Reanalyze targets parse back.
    from takzero_tpu.data.target import Target

    lines = re_file.read_text().splitlines()
    t = Target.from_line(3, lines[0])
    assert abs(t.value) <= 1.0
    assert 0 <= t.ube <= 4.0


def test_tailer_tolerates_truncated_file(tmp_path):
    """Fault injection: a rotated/rewritten target file must not wedge the
    reader (SURVEY.md §5.3 assumes files never shrink; Tailer recovers by
    re-tailing from offset 0)."""
    d = str(tmp_path)
    tail = co.Tailer(d, co.TARGETS_SELFPLAY)
    path = pathlib.Path(d) / co.TARGETS_SELFPLAY

    co.append_lines(d, co.TARGETS_SELFPLAY, ["a", "b", "c"])
    assert tail.read_new_lines() == ["a", "b", "c"]

    # Truncate-rewrite with SHORTER content: offset is past EOF.
    path.write_text("x\n")
    assert tail.read_new_lines() == ["x"]

    # Appends keep flowing after the recovery.
    co.append_lines(d, co.TARGETS_SELFPLAY, ["y"])
    assert tail.read_new_lines() == ["y"]

    # Torn (partial) final line is left for the next read.
    with open(path, "a", encoding="utf-8") as f:
        f.write("partial")
    assert tail.read_new_lines() == []
    with open(path, "a", encoding="utf-8") as f:
        f.write("-done\n")
    assert tail.read_new_lines() == ["partial-done"]


def test_tailer_detects_equal_or_longer_rewrite(tmp_path):
    """Fault injection: a rewrite whose new content is the SAME SIZE or
    LONGER than the consumed offset must also reset the reader — size
    alone cannot distinguish it from an append, so Tailer compares the
    inode and the first consumed bytes."""
    d = str(tmp_path)
    tail = co.Tailer(d, co.TARGETS_SELFPLAY)
    path = pathlib.Path(d) / co.TARGETS_SELFPLAY

    co.append_lines(d, co.TARGETS_SELFPLAY, ["aaa", "bbb"])
    assert tail.read_new_lines() == ["aaa", "bbb"]

    # In-place rewrite, same inode, LONGER content with different bytes:
    # without the signature check the reader would seek mid-record.
    path.write_text("XXXXX\nYYYYY\nZZZZZ\n")
    assert tail.read_new_lines() == ["XXXXX", "YYYYY", "ZZZZZ"]

    # Rotation: new file under the same name (new inode), same length as
    # the consumed prefix.
    repl = path.with_suffix(".new")
    repl.write_text("p\nq\nr\ns\nt\nu\n")
    repl.replace(path)
    got = tail.read_new_lines()
    assert got == ["p", "q", "r", "s", "t", "u"]

    # Appends still flow.
    co.append_lines(d, co.TARGETS_SELFPLAY, ["tail"])
    assert tail.read_new_lines() == ["tail"]


def test_devices_requested_parses_both_flag_forms():
    from takzero_tpu.drivers import _devices_requested

    assert _devices_requested(["x", "--devices", "4"]) == 4
    assert _devices_requested(["x", "--devices=8"]) == 8
    assert _devices_requested(["x", "--devices", "2", "--devices=6"]) == 6  # last wins
    assert _devices_requested(["x"]) is None
    assert _devices_requested(["x", "--devices"]) is None  # malformed: argparse reports
    assert _devices_requested(["x", "--devices=abc"]) is None


def test_tailer_handles_multibyte_utf8(tmp_path):
    """Offsets count bytes, not characters — multi-byte UTF-8 content
    must not desync the tail (re-reads or mid-character seeks)."""
    d = tmp_path
    tail = co.Tailer(d, co.TARGETS_SELFPLAY)
    co.append_lines(d, co.TARGETS_SELFPLAY, ["héllo;1;0;a1:1", "plain;1;0;a1:1"])
    assert tail.read_new_lines() == ["héllo;1;0;a1:1", "plain;1;0;a1:1"]
    co.append_lines(d, co.TARGETS_SELFPLAY, ["wörld;2;0;b1:1"])
    assert tail.read_new_lines() == ["wörld;2;0;b1:1"]  # no re-read, no error
    assert tail.read_new_lines() == []
