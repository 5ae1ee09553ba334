"""Guard the multihost learn broadcast-read path against serialization.

The coordinator tails target files once per read window and ships the
WHOLE batch of new lines in ONE broadcast_lines collective
(drivers/learn.py; parallel/multihost.py).  A regression to per-line or
per-target broadcasts would multiply cross-host round-trips by thousands
— invisible in a single-process run and drowned in noise on a loaded CPU
timing test, so this pins the CALL COUNTS deterministically: the learn
driver runs with jax.process_count monkeypatched to 2 and the multihost
collectives replaced by counting pass-throughs (process 0 semantics, no
real distributed backend needed).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_one_broadcast_per_read_window(tmp_path, monkeypatch):
    import jax

    from takzero_tpu.drivers import learn as learn_driver
    from takzero_tpu.parallel import multihost as multi
    from takzero_tpu.tak import engine
    from takzero_tpu.train.data import random_pretraining_targets

    eng = engine(3, half_komi=0)
    rng = np.random.default_rng(0)
    n_targets = 600
    targets = random_pretraining_targets(eng, n_targets, rng)
    (tmp_path / "targets-selfplay.txt").write_text(
        "".join(t.to_line() + "\n" for t in targets)
    )

    calls = {"scalar": 0, "lines": 0, "lines_payloads": []}

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multi, "is_coordinator", lambda: True)

    def fake_broadcast_scalar(v):
        calls["scalar"] += 1
        return int(v)

    def fake_broadcast_lines(lines):
        calls["lines"] += 1
        calls["lines_payloads"].append(0 if lines is None else len(lines))
        return lines or []

    monkeypatch.setattr(multi, "broadcast_scalar", fake_broadcast_scalar)
    monkeypatch.setattr(multi, "broadcast_lines", fake_broadcast_lines)

    steps = 12
    learn_driver.main(
        [
            "--directory", str(tmp_path), "--net", "tiny3", "--seed", "1",
            "--batch-size", "8", "--pretrain-steps", "0", "--no-wait",
            "--max-steps", str(steps), "--chunk-steps", "4",
        ]
    )

    # The driver must have consumed targets through the broadcast path...
    assert calls["lines"] >= 1
    assert max(calls["lines_payloads"]) >= n_targets // 2
    # ...and the collective count must scale with READ WINDOWS (a few per
    # chunk loop), never with the number of target lines shipped.
    assert calls["lines"] <= 2 * calls["scalar"] + 2
    assert calls["scalar"] <= steps + 8, calls
    assert sum(calls["lines_payloads"]) >= n_targets  # nothing dropped
