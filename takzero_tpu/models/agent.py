"""Network agents: bundles of weights + novelty state, and their evaluators.

An *agent bundle* is a pytree holding everything a search needs:
``{"params", "batch_stats", novelty state...}``.  ``net_evaluate`` turns a
bundle + env batch into ``(policy_logits [B,A], value [B], variance [B])``
with uncertainty = clamp(max(exp(ube), novelty), 0, 4)
(reference: net6_simhash.rs:259-323, net4_rnd.rs:239-303).

Novelty variants (reference §2.1):
* simhash — sign-bit projection into a device bitset (unseen -> 4.0);
* lcghash — LCG fold of the (randomly scaled) input planes into the bitset;
* rnd     — predictor/target squared error, min/max normalized to [0, 4];
* ensemble — variance across extra value heads;
* none    — exp(ube) only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bitset as bs
from ..ops.repr import input_channels, state_to_planes
from ..tak.engine import TakEngine
from .network import (
    MAXIMUM_VARIANCE,
    EnsembleHeads,
    NetConfig,
    RndPair,
    TakNet,
    init_network,
    init_rnd,
    simhash_matrix,
)

# 32-bit LCG fold constants (Numerical Recipes); the reference folds with a
# 64-bit LCG (net4_lcghash.rs:202-242) — only hash quality matters, not the
# exact constants.
_LCG_A = jnp.uint32(1664525)
_LCG_C = jnp.uint32(1013904223)


def new_agent(cfg: NetConfig, seed: int = 0):
    """Create a fresh agent bundle for the given config."""
    _, variables = init_network(cfg, seed)
    bundle = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    if cfg.novelty in ("simhash", "lcghash"):
        bundle["hash_bits"] = bs.bitset_init(cfg.hash_bits)
        if cfg.novelty == "simhash":
            bundle["hash_matrix"] = simhash_matrix(cfg, seed)
        else:
            bundle["hash_scale"] = jax.random.normal(
                jax.random.PRNGKey(seed ^ 0x1C6), (input_channels(cfg.n), cfg.n, cfg.n)
            )
    elif cfg.novelty == "rnd":
        _, rnd_vars = init_rnd(cfg, seed + 1)
        bundle["rnd_params"] = rnd_vars["params"]
        bundle["rnd_batch_stats"] = rnd_vars.get("batch_stats", {})
        bundle["rnd_min"] = jnp.zeros(())
        bundle["rnd_max"] = jnp.ones(())
    elif cfg.novelty == "ensemble":
        ens = EnsembleHeads(cfg)
        dummy_core = jnp.zeros((1, cfg.n, cfg.n, cfg.filters), cfg.compute_dtype)
        bundle["ensemble_params"] = ens.init(
            jax.random.PRNGKey(seed + 2), dummy_core
        )["params"]
    return bundle


# ---------------------------------------------------------------------------
# Novelty estimators
# ---------------------------------------------------------------------------


def simhash_indices(cfg: NetConfig, matrix, planes) -> jnp.ndarray:
    """uint32[B] hash bucket per position (net6_simhash.rs:203-234).

    The side-to-move channel (index C-2) is zeroed first, as in the
    reference ("too much of an impact").
    """
    b = planes.shape[0]
    c = input_channels(cfg.n)
    planes = planes.at[:, c - 2].set(0.0)
    dots = planes.reshape(b, -1) @ matrix  # [B, bits]
    bits = (dots >= 0).astype(jnp.uint32)
    powers = jnp.uint32(1) << jnp.arange(cfg.hash_bits, dtype=jnp.uint32)
    return jnp.sum(bits * powers[None, :], axis=-1, dtype=jnp.uint32)


def lcghash_indices(cfg: NetConfig, scale, planes) -> jnp.ndarray:
    """uint32[B]: LCG fold of bit-cast scaled planes (net4_lcghash.rs)."""
    b = planes.shape[0]
    c = input_channels(cfg.n)
    planes = planes.at[:, c - 2].set(0.0)
    x = (planes * scale[None]).reshape(b, -1)
    ints = jax.lax.bitcast_convert_type(x, jnp.uint32)

    def fold(acc, v):
        return acc * _LCG_A + _LCG_C + v, None

    acc, _ = jax.lax.scan(fold, jnp.zeros((b,), jnp.uint32), ints.T)
    if cfg.hash_bits < 32:
        acc = acc >> jnp.uint32(32 - cfg.hash_bits)
    return acc


def hash_novelty(cfg: NetConfig, bundle, planes) -> jnp.ndarray:
    if cfg.novelty == "simhash":
        idx = simhash_indices(cfg, bundle["hash_matrix"], planes)
    else:
        idx = lcghash_indices(cfg, bundle["hash_scale"], planes)
    seen = bs.bitset_query(bundle["hash_bits"], idx)
    return jnp.where(seen, 0.0, MAXIMUM_VARIANCE)


def hash_update(cfg: NetConfig, bundle, planes):
    """Mark positions as seen; returns the updated bundle."""
    if cfg.novelty == "simhash":
        idx = simhash_indices(cfg, bundle["hash_matrix"], planes)
    else:
        idx = lcghash_indices(cfg, bundle["hash_scale"], planes)
    return {**bundle, "hash_bits": bs.bitset_set(bundle["hash_bits"], idx)}


def rnd_raw(cfg: NetConfig, bundle, planes) -> jnp.ndarray:
    return RndPair(cfg).apply(
        {"params": bundle["rnd_params"], "batch_stats": bundle["rnd_batch_stats"]},
        planes,
        train=False,
    )


def rnd_novelty(cfg: NetConfig, bundle, planes) -> jnp.ndarray:
    """min/max-normalized RND error scaled to [0, 4] (net4_rnd.rs:225-230)."""
    err = rnd_raw(cfg, bundle, planes)
    lo, hi = bundle["rnd_min"], bundle["rnd_max"]
    norm = (err - lo) / jnp.maximum(hi - lo, 1e-8)
    return jnp.clip(norm, 0.0, 1.0) * MAXIMUM_VARIANCE


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


def make_net_evaluate(cfg: NetConfig, eng: TakEngine):
    """Build `net_evaluate(bundle, envs) -> (logits, value, variance)`."""
    model = TakNet(cfg)
    planes_batch = jax.vmap(lambda s: state_to_planes(eng, s))

    def net_evaluate(bundle, envs):
        planes = planes_batch(envs)
        policy, value, ube = model.apply(
            {"params": bundle["params"], "batch_stats": bundle["batch_stats"]},
            planes,
            train=False,
        )
        if cfg.novelty in ("simhash", "lcghash"):
            local = hash_novelty(cfg, bundle, planes)
        elif cfg.novelty == "rnd":
            local = rnd_novelty(cfg, bundle, planes)
        elif cfg.novelty == "ensemble":
            core = _core_only(cfg, bundle, planes)
            heads = EnsembleHeads(cfg).apply(
                {"params": bundle["ensemble_params"]}, core
            )
            local = jnp.var(heads, axis=-1)
        else:
            local = jnp.zeros_like(value)
        variance = jnp.clip(
            jnp.maximum(jnp.exp(ube), local), 0.0, MAXIMUM_VARIANCE
        )
        return policy, value, variance

    return net_evaluate


def _core_only(cfg: NetConfig, bundle, planes):
    from .network import Core

    x = jnp.transpose(planes, (0, 2, 3, 1)).astype(cfg.compute_dtype)
    return Core(cfg).apply(
        {
            "params": bundle["params"]["core"],
            "batch_stats": bundle["batch_stats"].get("core", {}),
        },
        x,
        False,
    )
