"""EEE experiment harness tests at tiny scale (3x3, few steps)."""

import numpy as np
import pytest

from takzero_tpu.data.target import Replay
from takzero_tpu.tak import engine, state_to_tps
from takzero_tpu.tak.oracle import Oracle


def _write_replays(eng, path, games: int, seed: int):
    """Random-playout replays via the C++ oracle (fast host path)."""
    from takzero_tpu.train.data import _host_opening

    orc = Oracle(eng.n, eng.half_komi, eng.reversible_limit)
    rng = np.random.default_rng(seed)
    lines = []
    for g in range(games):
        start = _host_opening(eng, orc, rng)
        _, actions, res = orc.random_playout(
            start, seed=int(rng.integers(1, 2**31)), max_plies=60
        )
        if res < 0:
            continue
        rep = Replay(
            tps=state_to_tps(eng.n, start),
            actions=[int(a) for a in actions],
            n=eng.n,
        )
        lines.append(rep.to_line())
    path.write_text("\n".join(lines) + "\n")
    return len(lines)


@pytest.mark.slow
def test_eee_rnd_and_generalization(tmp_path):
    eng = engine(3, half_komi=0)
    n_replays = _write_replays(eng, tmp_path / "replays.txt", games=6, seed=5)
    assert n_replays > 0

    from takzero_tpu.eee.rnd import run as run_rnd

    rows = run_rnd(
        tmp_path / "replays.txt",
        tmp_path / "rnd.csv",
        n=3,
        half_komi=0,
        steps=3,
        batch_size=8,
        seed=7,
    )
    assert len(rows) == 3
    # Training reduces surprise on the training batch.
    assert rows[-1]["after"] <= rows[-1]["current"]
    for name in ("early", "late", "random_early", "random_late", "impossible_early"):
        assert np.isfinite(rows[-1][name])
    header = (tmp_path / "rnd.csv").read_text().splitlines()[0]
    assert header.startswith("step,current,after,early,late")

    from takzero_tpu.eee.generalization import run as run_gen

    for novelty in ("simhash", "lcghash"):
        rows = run_gen(
            tmp_path / "replays.txt",
            tmp_path / f"gen_{novelty}.csv",
            n=3,
            half_komi=0,
            novelty=novelty,
            hash_bits=12,
            steps=3,
            batch_size=8,
            seed=7,
        )
        assert len(rows) == 3
        # Before any update everything is unseen (novelty 4); after the
        # first update the training batch is fully seen.
        assert rows[0]["current"] == pytest.approx(4.0)
        assert rows[0]["after"] == pytest.approx(0.0)
        # Values bounded in [0, 4].
        for m in rows:
            for v in m.values():
                assert -1e-6 <= v <= 4.0 + 1e-6


@pytest.mark.slow
def test_eee_ensemble_and_seen_ratio(tmp_path):
    eng = engine(3, half_komi=0)
    rng = np.random.default_rng(3)
    from takzero_tpu.train.data import random_pretraining_targets

    targets = random_pretraining_targets(eng, 48, rng)
    (tmp_path / "targets.txt").write_text(
        "\n".join(t.to_line() for t in targets) + "\n"
    )

    from takzero_tpu.eee.ensemble import run as run_ens

    rows = run_ens(
        tmp_path / "targets.txt",
        tmp_path / "ens.csv",
        n=3,
        half_komi=0,
        steps=2,
        batch_size=8,
        filters=8,
        blocks=1,
        ensemble_size=4,
        seed=11,
        take=24,
    )
    assert len(rows) == 2
    assert all(np.isfinite(m["loss"]) for m in rows)
    assert all(m["loss_ensemble"] >= 0 for m in rows)

    # seen_ratio on a fresh (empty bitset) agent: everything unseen -> 1.0.
    from takzero_tpu.eee.seen_ratio import run as run_seen
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.models.network import NetConfig

    cfg = NetConfig(n=3, half_komi=0, filters=8, blocks=1, novelty="simhash",
                    hash_bits=12)
    bundle = new_agent(cfg, seed=0)
    out = run_seen(bundle, cfg, max_ply=3, batch=16, seed=1)
    assert [p for p, _ in out] == [0, 1, 2]
    assert all(r == pytest.approx(1.0) for _, r in out)
