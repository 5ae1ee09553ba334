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

import functools

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
    reference ("too much of an impact").  On TPU the projection + sign +
    bit-pack run as one fused Pallas kernel (ops/pallas_kernels.py).
    """
    from ..ops.pallas_kernels import on_tpu, simhash_pack, simhash_pack_reference

    b = planes.shape[0]
    c = input_channels(cfg.n)
    planes = planes.at[:, c - 2].set(0.0)
    x = planes.reshape(b, -1)
    if on_tpu():
        return simhash_pack(x, matrix)
    return simhash_pack_reference(x, matrix)


def lcghash_indices(cfg: NetConfig, scale, planes) -> jnp.ndarray:
    """uint32[B]: LCG fold of bit-cast scaled planes (net4_lcghash.rs).

    The fold ``acc = A*acc + C + x_i`` is a linear recurrence, so it is
    computed in closed form as one modular dot product
    ``acc_K = sum_i A^(K-1-i) * x_i + C * sum_j A^j (mod 2^32)`` —
    fully parallel on the VPU instead of a K-step serial scan.
    """
    b = planes.shape[0]
    c = input_channels(cfg.n)
    planes = planes.at[:, c - 2].set(0.0)
    x = (planes * scale[None]).reshape(b, -1)
    ints = jax.lax.bitcast_convert_type(x, jnp.uint32)
    k = ints.shape[1]
    weights, const = _lcg_closed_form(k)
    acc = jnp.sum(
        ints * jnp.asarray(weights)[None, :], axis=-1, dtype=jnp.uint32
    ) + jnp.uint32(const)
    if cfg.hash_bits < 32:
        acc = acc >> jnp.uint32(32 - cfg.hash_bits)
    return acc


@functools.lru_cache(maxsize=None)
def _lcg_closed_form(k: int):
    """(weights uint32[k], const int): A^(k-1-i) and C*sum(A^j) mod 2^32.

    Host numpy constants (device arrays must not be cached across traces).
    """
    import numpy as np

    a, ccst = int(_LCG_A), int(_LCG_C)
    mod = 1 << 32
    pows = [1] * k
    for i in range(1, k):
        pows[i] = (pows[i - 1] * a) % mod
    weights = np.asarray([pows[k - 1 - i] for i in range(k)], np.uint32)
    const = np.uint32(ccst * sum(pows) % mod)
    return weights, const


def hash_indices(cfg: NetConfig, bundle, planes) -> jnp.ndarray:
    """uint32[B] bitset indices for a plane batch (projection constants
    live in the bundle and never train, so these are reproducible from
    any bundle of the same seed — the hash-log protocol relies on it)."""
    if cfg.novelty == "simhash":
        return simhash_indices(cfg, bundle["hash_matrix"], planes)
    return lcghash_indices(cfg, bundle["hash_scale"], planes)


def hash_novelty(cfg: NetConfig, bundle, planes) -> jnp.ndarray:
    seen = bs.bitset_query(bundle["hash_bits"], hash_indices(cfg, bundle, planes))
    return jnp.where(seen, 0.0, MAXIMUM_VARIANCE)


def hash_update(cfg: NetConfig, bundle, planes, axis_name: str | None = None):
    """Mark positions as seen; returns the updated bundle.

    Under ``shard_map`` pass the mesh ``axis_name``: each device sees only
    its batch shard, so the indices are all-gathered first — otherwise the
    supposedly replicated bitset diverges per device (and checkpointing,
    which saves device 0's view, silently drops the other shards' bits).
    The GSPMD ``jit`` path needs no axis name: XLA inserts the gather.
    """
    idx = hash_indices(cfg, bundle, planes)
    if axis_name is not None:
        idx = jax.lax.all_gather(idx, axis_name).reshape(-1)
    return {**bundle, "hash_bits": bs.bitset_set(bundle["hash_bits"], idx)}


def hash_indices_fresh(cfg: NetConfig, bundle, planes):
    """(uint32[B] indices, bool[B] fresh): fresh bits are NOT yet set in
    ``bundle["hash_bits"]``.  Hash-log producers (drivers/learn.py,
    drivers/coscheduled.py) call this on the PRE-update bundle — the
    train step's in-graph ``hash_update`` sets the same bits right after
    — and append only the fresh ones, so ``hash_log.bin`` is bounded by
    the number of distinct bits ever set instead of growing with every
    trained position (forced uses alone would duplicate each target
    >=4x; see utils/ckpt.py fresh_indices)."""
    idx = hash_indices(cfg, bundle, planes)
    return idx, ~bs.bitset_query(bundle["hash_bits"], idx)


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


def rnd_update_normalization(cfg: NetConfig, bundle, early_planes, late_planes):
    """Refresh min/max from reference batches: min of the predictor error on
    early-game positions, max on late-game (learn/src/rnd_normalization.rs:
    75-77).  The bounds ride in the bundle, so they checkpoint with it."""
    lo = jnp.min(rnd_raw(cfg, bundle, early_planes))
    hi = jnp.max(rnd_raw(cfg, bundle, late_planes))
    return {**bundle, "rnd_min": lo, "rnd_max": jnp.maximum(hi, lo + 1e-6)}


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


def make_net_evaluate(cfg: NetConfig, eng: TakEngine, folded: bool = True):
    """Build `net_evaluate(bundle, envs) -> (logits, value, variance)`.

    With `folded` (default), inference runs on BN-folded conv weights
    (network.apply_folded) — the fold is a pure function of the bundle, so
    XLA hoists it out of search loops and the tower runs as fused
    conv+bias+relu MXU chains.
    """
    from .network import apply_folded, fold_inference_params

    model = TakNet(cfg)
    planes_batch = jax.vmap(lambda s: state_to_planes(eng, s))

    def net_evaluate(bundle, envs):
        planes = planes_batch(envs)
        ensemble = cfg.novelty == "ensemble"
        core = None
        if folded:
            fw = fold_inference_params(
                cfg, bundle["params"], bundle["batch_stats"]
            )
            # Ensemble heads reuse the folded tower's core — recomputing
            # it (the old _core_only path) doubled NN cost per evaluation.
            out = apply_folded(cfg, fw, planes, with_core=ensemble)
            policy, value, ube = out[:3]
            if ensemble:
                core = out[3]
        else:
            policy, value, ube = model.apply(
                {"params": bundle["params"], "batch_stats": bundle["batch_stats"]},
                planes,
                train=False,
            )
        if cfg.novelty in ("simhash", "lcghash"):
            local = hash_novelty(cfg, bundle, planes)
        elif cfg.novelty == "rnd":
            local = rnd_novelty(cfg, bundle, planes)
        elif ensemble:
            if core is None:
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
