"""Reanalyze exploration-buffer mixing (reference `exploration` feature)."""

import numpy as np
import pytest

from takzero_tpu.drivers import learn as learn_driver
from takzero_tpu.drivers import reanalyze as reanalyze_driver
from takzero_tpu.drivers import selfplay as selfplay_driver


@pytest.mark.slow
def test_reanalyze_mixes_exploration_replays(tmp_path):
    d = str(tmp_path)
    learn_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "1",
            "--batch-size", "8", "--pretrain-targets", "32",
            "--pretrain-steps", "1", "--max-steps", "0", "--no-wait",
        ]
    )
    # Exploration selfplay writes replays-exploration.txt as well.
    selfplay_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "2",
            "--batch", "4", "--budget", "16", "--sampled", "4",
            "--max-steps", "40", "--exploration",
        ]
    )
    assert (tmp_path / "replays.txt").exists()
    assert (tmp_path / "replays-exploration.txt").exists()

    reanalyze_driver.main(
        [
            "--directory", d, "--net", "tiny3", "--seed", "3",
            "--batch", "8", "--budget", "16", "--sampled", "4",
            "--min-positions", "8", "--max-steps", "2",
            "--exploration-positions", "4",
        ]
    )
    out = tmp_path / "targets-reanalyze.txt"
    assert out.exists() and out.stat().st_size > 0
    from takzero_tpu.data.target import Target

    lines = out.read_text().splitlines()
    assert len(lines) >= 8
    for line in lines[:8]:
        Target.from_line(3, line)  # parses back
