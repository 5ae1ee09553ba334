"""Child-truncated roots keep the reference target wire contract.

The reference stores ALL children, so every target line lists exactly
every legal action and `Target::from_str` validates that
(target.rs:123-134).  With a child cap C, truncated roots must pad the
missing legal actions at p=0 — in both selfplay and reanalyze.
"""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.data.target import Target
from takzero_tpu.reanalyze import build_targets, make_reanalyze_step
from takzero_tpu.search.agents import simple_evaluator
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.selfplay import SelfplayConfig, SelfplayEngine
from takzero_tpu.tak import engine, state_to_tps, tps_to_state
from takzero_tpu.tak.oracle import Oracle


def _check_targets_cover_legal(n, oracle, targets, cap):
    assert targets, "no games finished — lengthen the loop"
    padded = 0
    for t in targets:
        legal = set(np.flatnonzero(oracle.legal_mask(tps_to_state(n, t.tps))))
        acts = [a for a, _ in t.policy]
        assert len(set(acts)) == len(acts), "duplicate action in policy"
        assert set(acts) == legal, (sorted(set(acts) ^ legal), t.tps)
        if len(legal) > cap:
            padded += 1
        # Wire round-trip stays exact.
        back = Target.from_line(n, t.to_line())
        assert set(a for a, _ in back.policy) == legal
    assert padded > 0, "no position exceeded the child cap — cap too high"


def test_selfplay_targets_pad_truncated_roots():
    eng = engine(3)
    oracle = Oracle(3, 0)
    cfg = SelfplayConfig(
        batch=4, beta=0.0, weighted_random_plies=2, sampled_actions=4,
        search_budget=16, max_children=4, max_depth=16,
    )
    sp = SelfplayEngine(eng, cfg, lambda bundle, e: simple_evaluator(eng)(e))
    sp.reset(jax.random.PRNGKey(0))
    targets = []
    key = jax.random.PRNGKey(1)
    for _ in range(40):
        key, k = jax.random.split(key)
        t, _, _ = sp.play_move({}, k)
        targets.extend(t)
        if len(targets) >= 8:
            break
    assert sp.truncation_totals[1] > 0  # the cap really bound
    _check_targets_cover_legal(3, oracle, targets, cap=4)


def test_reanalyze_targets_pad_truncated_roots():
    eng = engine(3)
    oracle = Oracle(3, 0)
    step = jax.jit(
        make_reanalyze_step(
            eng, lambda bundle, e: simple_evaluator(eng)(e),
            sampled_actions=4, search_budget=16, max_children=4, max_depth=16,
        )
    )
    envs = make_new_opening(eng, random_steps=3)(jax.random.PRNGKey(2), 4)
    tps_batch = [
        state_to_tps(3, jax.tree.map(lambda x: np.asarray(x)[i], envs))
        for i in range(4)
    ]
    _, pol, child_actions, ube, value, incomplete = step(envs, {}, jax.random.PRNGKey(3))
    assert np.asarray(incomplete).any()
    targets = build_targets(
        3, tps_batch, pol, child_actions, ube, value,
        incomplete=incomplete, oracle=oracle,
    )
    _check_targets_cover_legal(3, oracle, targets, cap=4)
