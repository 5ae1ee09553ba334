"""tools/elo_curve.py — the Elo-vs-steps pipeline end to end.

Mirrors the reference flow evaluation -> get_match_results.py -> elo.py
(match_results/*/*.csv; python/elo.py:99-152) over a tiny co-scheduled
training run.
"""

import json

from takzero_tpu.drivers import coscheduled
from takzero_tpu.tools import elo_curve

import pytest

pytestmark = pytest.mark.slow


def test_elo_curve_pipeline(tmp_path):
    # A tiny run with a low checkpoint cadence -> several numbered ckpts.
    coscheduled.main([
        "--directory", str(tmp_path), "--net", "tiny3", "--seed", "3",
        "--batch", "4", "--budget", "16", "--sampled", "4",
        "--batch-size", "8", "--steps-per-move", "2", "--max-moves", "40",
        "--steps-per-checkpoint", "16",
    ])
    rows = elo_curve.main([
        "--directory", str(tmp_path), "--net", "tiny3",
        "--rounds", "4", "--games", "2", "--budget", "16", "--sampled", "4",
        "--seed", "5",
    ])
    data = json.loads((tmp_path / "elo_curve.json").read_text())
    assert data["curve"] == rows
    assert len(rows) >= 2  # at least init + one trained checkpoint rated
    assert (tmp_path / "match_results.csv").exists()
    # Relative Bayes-Elo is mean-anchored; all points finite.
    assert all(abs(r["elo"]) < 5000 and r["stderr"] > 0 for r in rows)
    # Re-fit without re-matching is idempotent.
    rows2 = elo_curve.main([
        "--directory", str(tmp_path), "--net", "tiny3", "--skip-matches",
    ])
    assert rows2 == rows
