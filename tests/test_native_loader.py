"""Native (C++) data-loader vs the pure-Python wire-format parsers.

The text formats are the contract of the whole distributed system
(SURVEY.md §4 "Serialization round-trips") — the native loader must agree
with Python bit-for-bit on states, actions, values and offsets.
"""

import numpy as np
import pytest

from takzero_tpu.data import native_loader as nl
from takzero_tpu.data.target import Replay, Target
from takzero_tpu.tak import (
    action_to_ptn,
    engine,
    ptn_to_action,
    state_to_tps,
    tps_to_state,
)
from takzero_tpu.tak.oracle import Oracle
from takzero_tpu.tak.state import state_equal
from takzero_tpu.train.data import _host_opening


def _random_games(n, half_komi, games, seed, max_plies=80):
    eng = engine(n, half_komi=half_komi)
    orc = Oracle(n, half_komi, eng.reversible_limit)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(games):
        start = _host_opening(eng, orc, rng)
        _, actions, res = orc.random_playout(
            start, seed=int(rng.integers(1, 2**31)), max_plies=max_plies
        )
        out.append((start, [int(a) for a in actions], res))
    return eng, orc, rng, out


@pytest.mark.parametrize("n,half_komi", [(3, 0), (4, 4), (6, 4)])
def test_tps_and_ptn_native_match_python(n, half_komi):
    eng, orc, rng, games = _random_games(n, half_komi, 4, seed=n)
    for start, actions, _ in games:
        state = start
        for a in actions[:40]:
            tps = state_to_tps(n, state)
            ns = nl.parse_tps(n, tps)
            ps = tps_to_state(n, tps)
            assert state_equal(ns, ps), tps
            ptn = action_to_ptn(n, a)
            assert nl.parse_ptn(n, ptn) == ptn_to_action(n, ptn) == a
            state = orc.step(state, a)


def test_parse_targets_matches_python(tmp_path):
    n = 4
    eng, orc, rng, games = _random_games(n, 4, 3, seed=7)
    targets = []
    for start, actions, _ in games:
        state = start
        for a in actions[:10]:
            legal = np.nonzero(orc.legal_mask(state))[0]
            probs = rng.random(len(legal)).astype(np.float32)
            probs /= probs.sum()
            targets.append(
                Target(
                    tps=state_to_tps(n, state),
                    value=float(rng.uniform(-1, 1)),
                    ube=float(rng.uniform(0, 4)),
                    policy=[(int(x), float(p)) for x, p in zip(legal, probs)],
                    n=n,
                )
            )
            state = orc.step(state, a)
    text = "\n".join(t.to_line() for t in targets) + "\n"

    states, value, ube, actions, probs, offsets = nl.parse_targets(n, text)
    assert value.shape[0] == len(targets)
    for i, t in enumerate(targets):
        py = Target.from_line(n, t.to_line())
        assert value[i] == pytest.approx(py.value, abs=1e-6)
        assert ube[i] == pytest.approx(py.ube, abs=1e-6)
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        np.testing.assert_array_equal(
            actions[lo:hi], np.array([a for a, _ in py.policy])
        )
        np.testing.assert_allclose(
            probs[lo:hi], np.array([p for _, p in py.policy]), atol=1e-6
        )
        import jax

        lane = jax.tree.map(lambda x: x[i], states)
        assert state_equal(lane, tps_to_state(n, py.tps))


def test_parse_targets_skips_malformed():
    n = 4
    good = Target(
        tps="x4/x4/x4/2,x3 2 2", value=0.5, ube=1.0, policy=[(0, 1.0)], n=n
    ).to_line()
    text = "garbage;;;\n" + good + "\nx4/x4 2 2;0;0;a1:1\n"
    states, value, ube, actions, probs, offsets = nl.parse_targets(n, text)
    assert value.shape[0] == 1
    assert value[0] == pytest.approx(0.5)


def test_parse_replays_matches_python_explosion():
    n = 3
    eng, orc, rng, games = _random_games(n, 0, 4, seed=11, max_plies=30)
    lines = []
    for start, actions, res in games:
        if res < 0:
            continue
        lines.append(
            Replay(
                tps=state_to_tps(n, start), actions=actions, result="R-0", n=n
            ).to_line()
        )
    text = "\n".join(lines) + "\n"
    states, plies = nl.parse_replay_positions(n, 0, eng.reversible_limit, text)

    # Python-side explosion for comparison.
    import jax

    expected = []
    for line in lines:
        rep = Replay.from_line(n, line)
        expected.extend(rep.states(eng))
    assert states.height.shape[0] == len(expected)
    for i, exp in enumerate(expected):
        lane = jax.tree.map(lambda x: x[i], states)
        assert state_equal(lane, jax.tree.map(np.asarray, exp))
        assert plies[i] == int(np.asarray(exp.ply))


def test_make_batch_native_matches_python_no_augment():
    n = 3
    eng, orc, rng, games = _random_games(n, 0, 2, seed=3, max_plies=20)
    targets = []
    for start, actions, _ in games:
        state = start
        for a in actions[:6]:
            legal = np.nonzero(orc.legal_mask(state))[0]
            targets.append(
                Target(
                    tps=state_to_tps(n, state),
                    value=0.25,
                    ube=1.5,
                    policy=[(int(x), 1.0 / len(legal)) for x in legal],
                    n=n,
                )
            )
            state = orc.step(state, a)
    text = "\n".join(t.to_line() for t in targets) + "\n"

    from takzero_tpu.train.data import make_batch

    rng1 = np.random.default_rng(0)
    native = nl.make_batch_native(eng, text, rng1, augment=False)
    python = make_batch(eng, targets, np.random.default_rng(0), augment=False)
    np.testing.assert_allclose(
        np.asarray(native.planes), np.asarray(python.planes), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(native.policy), np.asarray(python.policy), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(native.mask), np.asarray(python.mask)
    )


def test_make_batch_native_augment_consistent():
    """Augmented batches keep distribution mass and mask/policy alignment."""
    n = 3
    eng = engine(n, half_komi=0)
    t = Target(
        tps="x3/x3/2,1,x 1 2",
        value=0.1,
        ube=0.2,
        policy=[(ptn_to_action(n, "a3"), 0.75), (ptn_to_action(n, "b2"), 0.25)],
        n=n,
    )
    text = "\n".join([t.to_line()] * 16) + "\n"
    batch = nl.make_batch_native(eng, text, np.random.default_rng(5), augment=True)
    pol = np.asarray(batch.policy)
    np.testing.assert_allclose(pol.sum(-1), 1.0, atol=1e-6)
    assert (np.asarray(batch.mask).sum(-1) == 2).all()
    # Each row's nonzero probs are exactly {0.75, 0.25}.
    for row in pol:
        np.testing.assert_allclose(sorted(row[row > 0]), [0.25, 0.75], atol=1e-6)


def test_scatter_policy_matches_dense_numpy():
    """Device-side COO scatter == the straightforward dense construction.

    Both make_batch and make_batch_native build policy/mask through
    ops.repr.scatter_policy now, so this pins the scatter itself against
    an independent numpy reference (including pad-bucket edges: empty,
    exactly-256, and just-past-a-power-of-two lengths).
    """
    from takzero_tpu.ops.repr import scatter_policy

    rng = np.random.default_rng(3)
    for t, a, length in [(5, 37, 0), (7, 300, 256), (11, 123, 257), (4, 50, 9)]:
        rows = rng.integers(0, t, size=length).astype(np.int32)
        cols = np.empty(length, np.int32)
        # Unique (row, col) pairs: sample columns without replacement per
        # row (every case above has length/t well under a).
        for r in range(t):
            idx = np.nonzero(rows == r)[0]
            cols[idx] = rng.choice(a, size=len(idx), replace=False)
        probs = rng.random(length).astype(np.float32)
        dense_p = np.zeros((t, a), np.float32)
        dense_m = np.zeros((t, a), bool)
        dense_p[rows, cols] = probs
        dense_m[rows, cols] = True
        pol, msk = scatter_policy(t, a, rows, cols, probs)
        np.testing.assert_array_equal(np.asarray(msk), dense_m)
        np.testing.assert_allclose(np.asarray(pol), dense_p, atol=0)


def test_fmt_shortest_float32_decimals():
    """Wire values are f32; _fmt must emit the shortest decimal that
    round-trips FLOAT32 (the reference's Rust Display), not a widened
    f64 repr ('0.996999979019165')."""
    import numpy as np

    from takzero_tpu.data.target import _fmt

    assert _fmt(np.float32(0.997)) == "0.997"
    assert _fmt(0.5) == "0.5"
    assert _fmt(4.0) == "4"
    assert _fmt(-1.0) == "-1"
    assert _fmt(float("nan")) == "nan"  # diverged net must not raise
    for v in [0.997, 1 / 3, 0.123456789, 1e-5, -0.001, 3.9999998]:
        s = _fmt(np.float32(v))
        assert np.float32(float(s)) == np.float32(v), (v, s)
        assert len(s) <= 12, (v, s)  # shortest-ish, never 17-digit f64 noise


def test_parse_replays_rolls_back_malformed_lines():
    """A replay line with a corrupted move token is skipped WHOLE — the
    positions emitted before the bad token must be rolled back (matching
    tak_parse_targets), not handed to reanalyze as a partial game."""
    n = 3
    eng, orc, rng, games = _random_games(n, 0, 2, seed=13, max_plies=20)
    start, actions, _ = games[0]
    good = Replay(
        tps=state_to_tps(n, start), actions=actions[:6], result="", n=n
    ).to_line()
    tokens = good.split(" ")
    bad = " ".join(tokens[:4] + ["ZZZ"] + tokens[4:])  # corrupt mid-game
    text = bad + "\n" + good + "\n"
    states, plies = nl.parse_replay_positions(n, 0, eng.reversible_limit, text)
    assert states.height.shape[0] == 6  # only the good line's positions
    expected = Replay.from_line(n, good).states(eng)
    import jax

    for i, exp in enumerate(expected):
        lane = jax.tree.map(lambda x: x[i], states)
        assert state_equal(lane, jax.tree.map(np.asarray, exp))


def test_make_batch_native_splits_matches_per_batch():
    """splits=c returns [c, T//c, ...] leaves equal to c separate
    per-batch assemblies of the same consecutive line groups (the learn
    driver's one-call chunk assembly, drivers/learn.py)."""
    n = 3
    eng, orc, rng, games = _random_games(n, 0, 3, seed=5, max_plies=24)
    targets = []
    for start, actions, _ in games:
        state = start
        for a in actions[:8]:
            legal = np.nonzero(orc.legal_mask(state))[0]
            targets.append(
                Target(
                    tps=state_to_tps(n, state),
                    value=-0.5,
                    ube=0.25,
                    policy=[(int(x), 1.0 / len(legal)) for x in legal],
                    n=n,
                )
            )
            state = orc.step(state, a)
    targets = targets[:24]  # 3 batches of 8
    lines = [t.to_line() for t in targets]
    rng1 = np.random.default_rng(0)
    whole = nl.make_batch_native(
        eng, "\n".join(lines) + "\n", rng1, augment=False, splits=3
    )
    for f in whole._fields:
        assert getattr(whole, f).shape[0] == 3, f
    for i in range(3):
        part = nl.make_batch_native(
            eng,
            "\n".join(lines[i * 8 : (i + 1) * 8]) + "\n",
            np.random.default_rng(0),
            augment=False,
        )
        for f in whole._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(whole, f)[i]),
                np.asarray(getattr(part, f)),
                atol=1e-6,
                err_msg=f,
            )
