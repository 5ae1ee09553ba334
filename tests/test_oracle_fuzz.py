"""Bit-exactness fuzzing: JAX engine vs the independent C++ oracle.

Per BASELINE.md north-star target: bit-exact Tak transitions at fixed seed.
The oracle plays random games; at every ply we compare the legal mask, the
stepped state, and the game result between the two implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from takzero_tpu.tak import engine
from takzero_tpu.tak.oracle import Oracle
from takzero_tpu.tak.state import state_equal


@pytest.mark.parametrize(
    "n,half_komi",
    [
        (3, 0),
        (4, 4),
        (5, 4),
        (6, 4),
        # 7x7/8x8: supported with the same u64 stack-bitfield tradeoff as
        # the reference's fast-tak Stack (slow: big action space on CPU).
        pytest.param(7, 4, marks=pytest.mark.slow),
        pytest.param(8, 4, marks=pytest.mark.slow),
    ],
)
def test_fuzz_vs_oracle(n, half_komi):
    eng = engine(n, half_komi=half_komi)
    orc = Oracle(n, half_komi=half_komi)
    step = jax.jit(eng.step)
    legal = jax.jit(eng.legal_mask)
    result = jax.jit(eng.game_result)

    rng = np.random.default_rng(1234 + n)
    games = 1 if n >= 7 else 2 if n >= 5 else 3
    for g in range(games):
        state = eng.initial()
        ply = 0
        while True:
            mask_jax = np.asarray(legal(state))
            mask_orc = orc.legal_mask(state)
            if not np.array_equal(mask_jax, mask_orc):
                diff = np.nonzero(mask_jax != mask_orc)[0]
                raise AssertionError(
                    f"n={n} game {g} ply {ply}: legal masks differ at {diff[:10]}"
                    f" jax={mask_jax[diff[:10]]}"
                )
            res_jax = int(result(state))
            res_orc = orc.result(state)
            assert res_jax == res_orc, f"n={n} g={g} ply={ply}: {res_jax}!={res_orc}"
            if res_jax != -1 or ply > 250:
                break
            action = rng.choice(np.nonzero(mask_jax)[0])
            nxt_jax = jax.tree.map(np.asarray, step(state, jnp.int32(action)))
            nxt_orc = orc.step(state, int(action))
            assert state_equal(nxt_jax, nxt_orc), (
                f"n={n} g={g} ply={ply} action={action}: states diverge"
            )
            assert int(nxt_jax.reversible) == int(nxt_orc.reversible)
            state = nxt_jax
            ply += 1
