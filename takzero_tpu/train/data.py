"""Target batches: symmetry augmentation + tensor assembly, and the
random-playout pre-training target generator.

Mirrors learn/src/main.rs:330-373 (augment + input/mask/policy tensors)
and 425-483 (pre-training: random games, uniform policy, discounted
terminal value, maximum-variance UBE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.target import Target
from ..ops.repr import state_to_planes
from ..search import eval as ev
from ..selfplay import ev_float_host, ev_negate_host
from ..tak import state_to_tps, tps_to_state
from ..tak.engine import TakEngine
from ..tak.oracle import Oracle
from ..tak.state import TakState
from ..tak.symmetry import action_maps, transform_state_np
from .learner import Batch


def stack_states(states) -> TakState:
    return jax.tree.map(lambda *xs: np.stack(xs), *states)


def make_batch(
    eng: TakEngine, targets: list[Target], rng: np.random.Generator,
    augment: bool = True, return_states: bool = False,
):
    from ..ops.repr import batch_planes_fn, scatter_policy

    n = eng.n
    a = eng.num_actions
    amap = action_maps(n)
    b = len(targets)
    states = []
    rows, cols, probs = [], [], []
    value = np.zeros((b,), np.float32)
    ube = np.zeros((b,), np.float32)
    for i, t in enumerate(targets):
        sym = int(rng.integers(0, 8)) if augment else 0
        state = tps_to_state(n, t.tps)
        states.append(transform_state_np(n, state, sym))
        for act, p in t.policy:
            rows.append(i)
            cols.append(amap[sym, act])
            probs.append(p)
        value[i] = t.value
        ube[i] = t.ube
    # Device-side dense scatter + cached jitted planes encoder (see
    # data/native_loader.py for why: tunnel traffic and per-primitive
    # dispatch round trips).
    policy, mask = scatter_policy(
        b, a,
        np.asarray(rows, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(probs, np.float32),
    )
    batched = jax.tree.map(jnp.asarray, stack_states(states))
    planes = batch_planes_fn(eng)(batched)
    batch = Batch(
        planes=planes,
        policy=policy,
        mask=mask,
        value=jnp.asarray(value),
        ube=jnp.asarray(ube),
    )
    if return_states:
        return batch, batched
    return batch


def random_pretraining_targets(
    eng: TakEngine,
    count: int,
    rng: np.random.Generator,
    max_variance: float = 4.0,
) -> list[Target]:
    """Targets from uniformly random games via the C++ oracle (fast host
    path; learn/src/main.rs:436-463)."""
    orc = Oracle(eng.n, eng.half_komi, eng.reversible_limit)
    out: list[Target] = []
    ube = max_variance - np.finfo(np.float32).eps
    while len(out) < count:
        state = _host_opening(eng, orc, rng)
        final, actions, res = orc.random_playout(
            state, seed=int(rng.integers(1, 2**63)), max_plies=400
        )
        if res < 0:
            continue  # hit the ply cap; discard
        # Terminal kind relative to the final position's side to move.
        to_move = int(final.to_move)
        tk = 3 if res == 2 else (1 if res == to_move else 2)
        # Walk backwards: value at each position is the negated, discounted
        # continuation of the terminal eval.
        per_position = []
        cur = state
        for act in actions:
            legal = np.nonzero(orc.legal_mask(cur))[0]
            per_position.append((cur, legal))
            cur = orc.step(cur, act)
        flag, ply = tk, 0
        for cur, legal in reversed(per_position):
            flag, ply, _ = ev_negate_host(flag, ply)
            value = ev_float_host(flag, ply, ev.DISCOUNT)
            p = 1.0 / len(legal)
            out.append(
                Target(
                    tps=state_to_tps(eng.n, cur),
                    value=value,
                    ube=float(ube),
                    policy=[(int(a2), p) for a2 in legal],
                    n=eng.n,
                )
            )
    return out[:count]


def _host_opening(eng: TakEngine, orc: Oracle, rng: np.random.Generator):
    """Reference opening (two corner flats under a symmetry) on host."""
    from ..tak.state import initial_state
    from ..tak.symmetry import square_maps

    n = eng.n
    sqm = square_maps(n)
    sym = int(rng.integers(0, 8))
    pair = int(rng.integers(0, 2))
    a1, an, xn = 0, (n - 1) * n, (n - 1) * n + (n - 1)
    squares = [a1, an] if pair == 0 else [a1, xn]
    state = jax.tree.map(np.asarray, initial_state(n))
    for sq in squares:
        state = orc.step(state, int(sqm[sym, sq]))
    return state
