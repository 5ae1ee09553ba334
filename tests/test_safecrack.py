"""SafeCrack discounted-value propagation (reference env.rs:109-208 +
mcts.rs:413-445).

A fake, never-terminal environment: on *active* plies the searcher enters
a digit 0-9; every other ply is a forced no-op (action 10), making it an
alternating two-player game where the opponent does nothing.  The
SafeCracker agent returns value +1/-1 (active/passive side) exactly when
the tried digits start with the secret key.  The search must push a
*positive* discounted value to the root (good for the cracker) and a
*negative* value onto the key-digit child (bad for the no-op opponent),
leaving wrong-digit children at 0 — exercising sign alternation and
discounting through the tree with no solver involvement.

This also demonstrates the search kernels are engine-agnostic: anything
with step/terminal_kind/legal_mask and a ply-carrying state pytree plugs
in.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.tree import init_tree

# The reference uses a 5-digit key with 100k sims (mcts.rs:414-416); a
# 3-digit key needs ~10^3 paths and keeps the test fast on CPU.
KEY = (0, 1, 2)
MAXLEN = 16
NUM_ACTIONS = 11  # digits 0-9 + the forced no-op


class CrackState(NamedTuple):
    tried: jnp.ndarray  # int32[MAXLEN]
    length: jnp.ndarray  # int32[]
    active: jnp.ndarray  # int32[] 1 = cracker to move
    ply: jnp.ndarray  # int32[]


class SafeCrackEngine:
    num_actions = NUM_ACTIONS

    def initial(self):
        return CrackState(
            tried=jnp.full((MAXLEN,), -1, jnp.int32),
            length=jnp.int32(0),
            active=jnp.int32(1),
            ply=jnp.int32(0),
        )

    def step(self, s: CrackState, action) -> CrackState:
        is_active = s.active == 1
        tried = jnp.where(
            is_active, s.tried.at[s.length].set(action), s.tried
        )
        return CrackState(
            tried=tried,
            length=s.length + is_active.astype(jnp.int32),
            active=1 - s.active,
            ply=s.ply + 1,
        )

    def legal_mask(self, s: CrackState):
        digits = jnp.arange(NUM_ACTIONS) < 10
        noop = jnp.arange(NUM_ACTIONS) == 10
        return jnp.where(s.active == 1, digits, noop)

    def terminal_kind(self, s: CrackState):
        return jnp.int32(0)  # the game never ends


def solved(s: CrackState) -> jnp.ndarray:
    key = jnp.asarray(KEY, jnp.int32)
    have = s.length >= len(KEY)
    match = jnp.all(s.tried[: len(KEY)] == key)
    return have & match


def safecracker_evaluator(eng):
    def evaluate(envs):
        legal = jax.vmap(eng.legal_mask)(envs)
        logits = jnp.where(legal, 1.0, -1e9)
        sign = jnp.where(envs.active == 1, 1.0, -1.0)
        value = sign * jax.vmap(solved)(envs).astype(jnp.float32)
        return logits, value, jnp.zeros_like(value)

    return evaluate


def test_safe_cracker_value_propagation():
    eng = SafeCrackEngine()
    simulate, simulate_batch = make_kernels(
        eng, safecracker_evaluator(eng), max_depth=2 * len(KEY) + 4
    )

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(1))
        def body(i, t):
            return simulate_batch(t, jnp.zeros(1), 63)
        return jax.lax.fori_loop(0, 200, body, tree)

    env = eng.initial()
    for k in KEY:
        envs = jax.tree.map(lambda x: x[None], env)
        tree = init_tree(None, envs, max_nodes=14000, max_children=NUM_ACTIONS)
        tree = run(tree)

        root_val = float(tree.root_value[0])
        assert root_val > 0.0, f"stage {k}: root {root_val}"
        acts = np.asarray(tree.child_action[0, 0])
        vals = np.asarray(tree.child_value[0, 0])
        visits = np.asarray(tree.child_visit[0, 0])
        for a, v, n in zip(acts, vals, visits):
            if a < 0:
                continue
            if a == k:
                assert v < 0.0, f"key child {a}: {v} (visits {n})"
            else:
                # Wrong digits never reach the key: value stays ~0.
                assert abs(v) < 0.05, f"child {a}: {v}"

        # Play the key digit + the forced no-op, as the reference descends.
        env = eng.step(eng.step(env, jnp.int32(k)), jnp.int32(10))
