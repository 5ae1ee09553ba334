"""Shared EEE batch builders (reference eee/src/utils.rs).

Reference-batch semantics (eee/utils.rs:34-96, eee/rnd.rs:136-179):

* early  — unique replay positions at ply 8;
* late   — unique replay positions at ply 60;
* random_early / random_late — fresh random games to the same plies
  (standard openings + uniformly random legal steps);
* impossible_early — a THIRD independent random-early batch with its
  first 8 input channels permuted ([6,7,4,5,2,3,0,1]: the side-to-move
  top one-hots swap into the stack-carry planes, eee/utils.rs:78-89) —
  positions no real game can produce, probing whether the novelty
  estimator fires off-distribution.

All batches are device plane tensors [B, C, N, N]; generation is
vectorized (vmapped engine) rather than per-game host loops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..data.target import Replay
from ..ops.repr import input_channels, state_to_planes
from ..search.openings import make_new_opening
from ..tak import state_to_tps
from ..tak.engine import TakEngine


def impossible_permutation(n: int) -> np.ndarray:
    """Channel permutation producing impossible inputs (eee/utils.rs:79-89)."""
    c = input_channels(n)
    head = [6, 7, 4, 5, 2, 3, 0, 1]
    return np.array(head + list(range(8, c)), np.int32)


def planes_of(eng: TakEngine, envs) -> jnp.ndarray:
    from ..ops.repr import batch_planes_fn

    return batch_planes_fn(eng)(envs)


def random_plane_batch(eng: TakEngine, key, ply: int, batch: int) -> jnp.ndarray:
    """[B, C, N, N] planes of random games at the given ply.

    Matches eee/utils.rs `reference_envs`: standard two-corner-flats
    opening plus `ply` uniformly random steps (ply counts the random
    steps, as in Env::new_opening_with_random_steps).
    """
    envs = make_new_opening(eng, random_steps=ply)(key, batch)
    return planes_of(eng, envs)


def replay_positions(eng: TakEngine, replay_file, limit: int | None = None):
    """Yield (state, ply, tps) for every position of every replay, in order.

    `tps` keys the uniqueness set the reference builds with canonical()
    — we key on literal TPS, which only differs by board symmetry and
    does not change the experiment's character.
    """
    count = 0
    with open(replay_file, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            replay = Replay.from_line(eng.n, line)
            for state in replay.states(eng):
                ply = int(np.asarray(state.ply))
                yield state, ply, state_to_tps(eng.n, state)
                count += 1
                if limit is not None and count >= limit:
                    return


def reference_batches(
    eng: TakEngine,
    unique_by_ply: dict[int, list],
    key,
    batch_size: int,
    early_ply: int = 8,
    late_ply: int = 60,
):
    """dict of plane batches: early/late (replay), random_early/late,
    impossible_early. Replay plies missing from the stream fall back to
    random games at the same ply (keeps small test runs working)."""
    from ..train.data import stack_states

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(k5)).ravel()[-1])
    out = {}
    for name, ply, k in (("early", early_ply, k1), ("late", late_ply, k2)):
        pool = unique_by_ply.get(ply, [])
        if len(pool) >= batch_size:
            picks = [pool[i] for i in rng.choice(len(pool), batch_size, replace=False)]
            envs = jax.tree.map(jnp.asarray, stack_states(picks))
            out[name] = planes_of(eng, envs)
        else:
            out[name] = random_plane_batch(eng, k, ply, batch_size)
    out["random_early"] = random_plane_batch(eng, k3, early_ply, batch_size)
    out["random_late"] = random_plane_batch(eng, k4, late_ply, batch_size)
    # An INDEPENDENT third random batch, as in the reference
    # (eee/utils.rs:78 draws fresh reference_envs before permuting) —
    # permuting random_early itself would pair the two columns' samples.
    perm = jnp.asarray(impossible_permutation(eng.n))
    out["impossible_early"] = random_plane_batch(
        eng, k6, early_ply, batch_size
    )[:, perm]
    return out
