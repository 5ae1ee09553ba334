"""Minimum end-to-end slice: selfplay -> targets -> learner step.

The in-process equivalent of the reference's multi-process loop (SURVEY.md
§4 recommends exactly this kind of fake of the coordination layer).
"""

import jax
import numpy as np
import pytest

from takzero_tpu.data.target import Replay, Target
from takzero_tpu.models.agent import make_net_evaluate, new_agent
from takzero_tpu.models.network import NetConfig
from takzero_tpu.selfplay import SelfplayConfig, SelfplayEngine
from takzero_tpu.tak import engine
from takzero_tpu.train.data import make_batch, random_pretraining_targets
from takzero_tpu.train.learner import make_optimizer, make_train_step
from takzero_tpu.utils import ckpt

TINY = dict(filters=16, blocks=2, hash_bits=12, rnd_filters=8, rnd_blocks=1)


@pytest.fixture(scope="module")
def setup():
    eng = engine(3, half_komi=0)
    cfg = NetConfig(n=3, half_komi=0, novelty="simhash", **TINY)
    bundle = new_agent(cfg, seed=0)
    return eng, cfg, bundle


def test_selfplay_generates_targets_and_replays(setup):
    eng, cfg, bundle = setup
    sp_cfg = SelfplayConfig(
        batch=4,
        beta=0.25,
        exploration=True,
        weighted_random_plies=2,
        sampled_actions=4,
        search_budget=16,
        max_children=48,
        max_depth=16,
    )
    evaluator = make_net_evaluate(cfg, eng)
    sp = SelfplayEngine(eng, sp_cfg, evaluator)
    sp.reset(jax.random.PRNGKey(0))
    targets, replays = [], []
    for i in range(40):
        t, r, _er = sp.play_move(bundle, jax.random.PRNGKey(100 + i))
        targets.extend(t)
        replays.extend(r)
        if targets and replays:
            break
    assert targets, "no games finished in 40 plies of 4 concurrent 3x3 games"
    assert replays

    # Serialization round trips.
    for t in targets[:5]:
        line = t.to_line()
        back = Target.from_line(3, line)
        assert back.to_line() == line
        assert abs(back.value) <= 1.0
        total_p = sum(p for _, p in back.policy)
        assert abs(total_p - 1.0) < 1e-3
    for r in replays[:3]:
        line = r.to_line()
        back = Replay.from_line(3, line)
        assert back.to_line() == line
        assert back.result in ("R-0", "0-R", "F-0", "0-F", "1/2-1/2")
        # Replaying the actions must reach a terminal state.
        states = back.states(eng)
        assert len(states) == len(back.actions)

    # Values alternate sign backwards from the terminal (discounted).
    by_game = {}
    for t in targets:
        by_game.setdefault(id(t), t)
    vals = [t.value for t in targets]
    assert all(abs(v) <= 1.0 for v in vals)


def test_learner_step_and_checkpoint(tmp_path, setup):
    eng, cfg, bundle = setup
    rng = np.random.default_rng(7)
    targets = random_pretraining_targets(eng, 32, rng)
    assert len(targets) == 32
    batch = make_batch(eng, targets[:8], rng)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(bundle["params"])
    train_step = jax.jit(
        make_train_step(cfg, tx), static_argnames=("train_ube",)
    )
    metrics_first = None
    for i in range(3):
        batch = make_batch(eng, targets[8 * i : 8 * (i + 1)], rng)
        bundle, opt_state, metrics = train_step(
            bundle, opt_state, batch, train_ube=False
        )
        if metrics_first is None:
            metrics_first = jax.tree.map(float, metrics)
    m = jax.tree.map(float, metrics)
    assert np.isfinite(m["loss"])
    assert m["loss_ube"] == 0.0

    # UBE on:
    bundle, opt_state, metrics = train_step(bundle, opt_state, batch, train_ube=True)
    assert float(metrics["loss_ube"]) > 0.0

    # Checkpoint round trip (latest + step naming).
    ckpt.save_checkpoint(tmp_path, "model_latest.ckpt", bundle)
    ckpt.save_checkpoint(tmp_path, "model_0000100.ckpt", bundle)
    best = ckpt.model_path_with_most_steps(tmp_path)
    assert best[0] == 100
    loaded = ckpt.load_checkpoint(tmp_path / "model_latest.ckpt", bundle)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(bundle)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
