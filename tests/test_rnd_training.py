"""RND predictor training + min/max normalization (reference loss_rnd +
learn/src/rnd_normalization.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.eee.harness import random_plane_batch
from takzero_tpu.models.agent import (
    new_agent,
    rnd_novelty,
    rnd_raw,
    rnd_update_normalization,
)
from takzero_tpu.models.network import NetConfig
from takzero_tpu.tak import engine
from takzero_tpu.train.data import make_batch, random_pretraining_targets
from takzero_tpu.train.learner import init_opt, make_optimizer, make_train_step


def test_rnd_trains_and_normalizes():
    cfg = NetConfig(
        n=3, half_komi=0, filters=8, blocks=1, novelty="rnd",
        rnd_filters=8, rnd_blocks=1,
    )
    eng = engine(3, half_komi=0)
    rng = np.random.default_rng(0)
    bundle = new_agent(cfg, seed=0)
    tx = make_optimizer(1e-3)
    opt_state = init_opt(cfg, tx, bundle)
    step = jax.jit(make_train_step(cfg, tx), static_argnames=("train_ube",))

    targets = random_pretraining_targets(eng, 16, rng)
    batch = make_batch(eng, targets, rng, augment=False)
    err_before = float(jnp.mean(rnd_raw(cfg, bundle, batch.planes)))
    losses = []
    for _ in range(8):
        bundle, opt_state, m = step(bundle, opt_state, batch, train_ube=True)
        losses.append(float(m["loss_rnd"]))
    err_after = float(jnp.mean(rnd_raw(cfg, bundle, batch.planes)))
    # Predictor error on the training batch decreases.
    assert err_after < err_before
    assert losses[-1] < losses[0]

    # Normalization: min from early batch, max from late batch.
    early = random_plane_batch(eng, jax.random.PRNGKey(1), 2, 8)
    late = random_plane_batch(eng, jax.random.PRNGKey(2), 8, 8)
    bundle = rnd_update_normalization(cfg, bundle, early, late)
    lo, hi = float(bundle["rnd_min"]), float(bundle["rnd_max"])
    assert hi > lo
    nov = np.asarray(rnd_novelty(cfg, bundle, late))
    assert (nov >= 0).all() and (nov <= 4.0).all()
    # The batch we trained on hard should look less novel than late refs.
    trained_nov = float(jnp.mean(rnd_novelty(cfg, bundle, batch.planes)))
    assert trained_nov <= float(np.mean(nov)) + 1e-6
