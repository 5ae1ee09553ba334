"""Pin the reanalyze value-target sign/definition.

The reference's reanalyze target value is the CHOSEN CHILD'S NEGATED Q —
or the solved root eval when the solver proved the root
(reanalyze/src/main.rs:183-195).  A sign/definition bug here would look
exactly like the transient Elo dip observed when reanalyze targets join
the learner mix (VERDICT r3 weak #4), so both branches are pinned:

* negated-Q branch: with an evaluator that scores every position +0.9
  for white (i.e. -0.9 from black-to-move's view), a white-to-move root's
  children all carry Q ~= -0.9 from the child mover's perspective; the
  target must come back POSITIVE (~+0.9 for the root mover).  A missing
  negate returns ~-0.9.
* solved-root branch: on a proven tinue root the target must be the
  discounted +1 win eval, not any child Q.
"""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.reanalyze import build_targets, make_reanalyze_step
from takzero_tpu.search.agents import dummy_evaluator
from takzero_tpu.tak import engine, ptn_to_action


def _root(eng, moves, batch=2):
    s = eng.initial()
    for m in moves:
        s = eng.step_jit(s, ptn_to_action(eng.n, m))
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)


def _run_step(eng, evaluator_factory, envs, budget):
    step = jax.jit(
        make_reanalyze_step(
            eng, evaluator_factory, sampled_actions=4, search_budget=budget,
            max_children=32, max_depth=24,
        )
    )
    return step(envs, None, jax.random.PRNGKey(0))


def test_value_is_negated_child_q():
    eng = engine(3, half_komi=0)

    def white_winning(bundle, e):
        del bundle
        b = e.ply.shape[0]
        logits = jnp.ones((b, eng.num_actions), jnp.float32)
        value = jnp.where(e.to_move == 0, 0.9, -0.9)
        return logits, value, jnp.zeros((b,), jnp.float32)

    envs = _root(eng, ["a3", "a1"])  # quiet, white to move, no proof
    _, _, _, _, value, _ = _run_step(eng, white_winning, envs, budget=64)
    value = np.asarray(value)
    # Children (black to move) all evaluate ~-0.9 from their own view;
    # the target is the chosen child's NEGATED Q: positive for white.
    assert (value > 0.5).all(), value

    # Mirror: a black-to-move root must see ~-0.9 (white still winning).
    envs_b = _root(eng, ["a3", "a1", "b1"])
    _, _, _, _, value_b, _ = _run_step(eng, white_winning, envs_b, budget=64)
    value_b = np.asarray(value_b)
    assert (value_b < -0.5).all(), value_b


def test_value_is_solved_root_eval_when_proven():
    eng = engine(3, half_komi=0)
    # mcts.rs:345-376 fixture: white has a provable tinue here.
    envs = _root(eng, ["a3", "c1", "c2", "c3", "b3", "c3-"])
    factory = lambda bundle, e: dummy_evaluator(eng)(e)  # noqa: E731
    _, _, _, _, value, _ = _run_step(eng, factory, envs, budget=768)
    value = np.asarray(value)
    # Solved root: discounted +1 win eval (0.997^ply), not a child Q mix.
    assert (value > 0.95).all(), value


def test_build_targets_carries_value_verbatim():
    eng = engine(3, half_komi=0)
    tps = "x3/x3/x3 1 1"
    t = build_targets(
        3, [tps],
        pol=np.array([[1.0]]), child_actions=np.array([[0]]),
        ube=np.array([0.25]), value=np.array([-0.625]),
    )[0]
    assert t.value == -0.625 and t.tps == tps
