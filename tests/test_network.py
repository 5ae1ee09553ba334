"""Network + agent smoke tests (tiny configs; reference: net*.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from takzero_tpu.models.agent import (
    hash_novelty,
    hash_update,
    make_net_evaluate,
    new_agent,
    rnd_novelty,
)
from takzero_tpu.models.network import MAXIMUM_VARIANCE, NetConfig
from takzero_tpu.ops import bitset as bs
from takzero_tpu.ops.repr import state_to_planes
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.tak import engine

TINY = dict(filters=16, blocks=2, hash_bits=12, rnd_filters=8, rnd_blocks=1)


def tiny_cfg(n=3, novelty="simhash", **kw):
    return NetConfig(n=n, half_komi=0, novelty=novelty, **{**TINY, **kw})


def envs_for(n, batch, seed=0):
    eng = engine(n)
    return eng, make_new_opening(eng, random_steps=2)(jax.random.PRNGKey(seed), batch)


@pytest.mark.parametrize("novelty", ["simhash", "rnd", "none", "lcghash"])
def test_evaluate_shapes(novelty):
    cfg = tiny_cfg(novelty=novelty)
    eng, envs = envs_for(3, 4)
    bundle = new_agent(cfg, seed=1)
    evaluate = jax.jit(make_net_evaluate(cfg, eng))
    logits, value, var = evaluate(bundle, envs)
    assert logits.shape == (4, cfg.num_actions)
    assert value.shape == (4,) and var.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()
    assert (np.abs(np.asarray(value)) <= 1).all()
    assert (np.asarray(var) >= 0).all() and (np.asarray(var) <= MAXIMUM_VARIANCE).all()


def test_hash_counts_monotone():
    # Reference net6_simhash.rs:370-398: seen positions lose their novelty.
    cfg = tiny_cfg()
    eng, envs = envs_for(3, 8, seed=2)
    bundle = new_agent(cfg, seed=3)
    planes = jax.vmap(lambda s: state_to_planes(eng, s))(envs)
    before = np.asarray(hash_novelty(cfg, bundle, planes))
    assert (before == MAXIMUM_VARIANCE).all()
    bundle = hash_update(cfg, bundle, planes)
    after = np.asarray(hash_novelty(cfg, bundle, planes))
    assert (after == 0).all()


def test_bitset_ops():
    b = bs.bitset_init(10)
    idx = jnp.asarray([0, 1, 31, 32, 33, 1023, 1, 1], jnp.uint32)
    b = bs.bitset_set(b, idx)
    assert np.asarray(bs.bitset_query(b, idx)).all()
    other = jnp.asarray([2, 34, 1022], jnp.uint32)
    assert not np.asarray(bs.bitset_query(b, other)).any()
    # Idempotent re-set.
    b2 = bs.bitset_set(b, idx)
    assert np.array_equal(np.asarray(b), np.asarray(b2))


def test_rnd_normalization():
    cfg = tiny_cfg(novelty="rnd")
    eng, envs = envs_for(3, 4, seed=5)
    bundle = new_agent(cfg, seed=6)
    planes = jax.vmap(lambda s: state_to_planes(eng, s))(envs)
    nov = np.asarray(rnd_novelty(cfg, bundle, planes))
    assert ((nov >= 0) & (nov <= MAXIMUM_VARIANCE)).all()
