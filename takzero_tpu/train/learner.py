"""Training step, losses, and pre-training targets.

Loss exactly as the reference learner (learn/src/main.rs:375-423):

* policy: cross entropy between the improved-policy target and the
  move-masked log-softmax of the policy head, summed then / batch;
* value: MSE against the discounted n-step return;
* UBE: MSE in log-variance space, target clamped to [-10, ln 4]
  (disabled during pre-training);
* after each step the hash-novelty set is updated with the batch inputs.

Data parallelism: `make_train_step` returns a step function that can be
jitted plainly (single chip) or under `shard_map`/NamedSharding over a
`dp` mesh axis — gradients are `pmean`-ed over `dp` (per-shard losses
are already per-shard means; see parallel/mesh.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.agent import hash_update
from ..models.network import MAXIMUM_VARIANCE, NetConfig, TakNet

MINIMUM_UBE_TARGET = -10.0
F32_MIN = jnp.finfo(jnp.float32).min


class Batch(NamedTuple):
    planes: jnp.ndarray  # [B, C, N, N]
    policy: jnp.ndarray  # [B, A] target probabilities (zeros on illegal)
    mask: jnp.ndarray  # [B, A] bool, True = legal
    value: jnp.ndarray  # [B]
    ube: jnp.ndarray  # [B] raw variance target (log+clamp applied here)


def loss_fn(cfg: NetConfig, params, batch_stats, batch: Batch, train_ube: bool):
    model = TakNet(cfg)
    (policy, value, ube), mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch.planes,
        train=True,
        mutable=["batch_stats"],
    )
    b = policy.shape[0]
    masked = jnp.where(batch.mask, policy, F32_MIN)
    logp = jax.nn.log_softmax(masked, axis=-1)
    loss_policy = -jnp.sum(logp * batch.policy) / b
    loss_value = jnp.mean((batch.value - value) ** 2)
    target_ube = jnp.clip(
        jnp.log(jnp.maximum(batch.ube, 1e-12)),
        MINIMUM_UBE_TARGET,
        jnp.log(MAXIMUM_VARIANCE),
    )
    loss_ube = jnp.mean((target_ube - ube) ** 2) if train_ube else 0.0
    loss = loss_policy + loss_value + loss_ube
    metrics = {
        "loss": loss,
        "loss_policy": loss_policy,
        "loss_value": loss_value,
        "loss_ube": jnp.asarray(loss_ube, jnp.float32),
    }
    return loss, (mutated["batch_stats"], metrics)


def make_optimizer(learning_rate: float = 1e-4):
    return optax.adam(learning_rate)  # reference: Adam lr=1e-4 (learn:122)


def trainable_of(cfg: NetConfig, bundle):
    """The pytree the optimizer tracks: net params (+ RND predictor).

    Ensemble heads are deliberately NOT here: the reference's learn
    binary never trains them either — they train only in the
    eee/ensemble experiment (eee/src/ensemble.rs:320-339), mirrored by
    eee/ensemble.py.  drivers/learn.py warns when they'd stay at init."""
    if cfg.novelty == "rnd":
        return (bundle["params"], bundle["rnd_params"])
    return bundle["params"]


def init_opt(cfg: NetConfig, tx, bundle):
    return tx.init(trainable_of(cfg, bundle))


def make_train_step(cfg: NetConfig, tx=None, axis_name: str | None = None):
    """Build `train_step(bundle, opt_state, batch, train_ube) -> ...`.

    With `axis_name` set, gradients and batch stats are averaged across
    that mesh axis (for use under shard_map).  For RND variants the
    predictor trains jointly on the batch inputs (the reference's
    `loss_rnd`, learn/src/main.rs:404; the frozen target gets zero grads
    via stop_gradient).
    """
    tx = tx or make_optimizer()

    def train_step(bundle, opt_state, batch: Batch, train_ube: bool):
        rnd = cfg.novelty == "rnd"

        def full_loss(trainable):
            params = trainable[0] if rnd else trainable
            loss, (new_stats, metrics) = loss_fn(
                cfg, params, bundle["batch_stats"], batch, train_ube
            )
            aux_updates = {}
            if rnd:
                from ..models.network import RndPair

                err, mut = RndPair(cfg).apply(
                    {
                        "params": trainable[1],
                        "batch_stats": bundle["rnd_batch_stats"],
                    },
                    batch.planes,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss_rnd = jnp.mean(err)
                loss = loss + loss_rnd
                metrics = {**metrics, "loss_rnd": loss_rnd, "loss": loss}
                aux_updates["rnd_batch_stats"] = mut["batch_stats"]
            return loss, (new_stats, metrics, aux_updates)

        trainable = trainable_of(cfg, bundle)
        grad_fn = jax.value_and_grad(full_loss, has_aux=True)
        (_, (new_stats, metrics, aux)), grads = grad_fn(trainable)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        if rnd:
            params, rnd_params = new_trainable
            bundle = {
                **bundle,
                "params": params,
                "rnd_params": rnd_params,
                "batch_stats": new_stats,
                **aux,
            }
        else:
            bundle = {**bundle, "params": new_trainable, "batch_stats": new_stats}
        if cfg.novelty in ("simhash", "lcghash"):
            # axis_name: all-gather the shard's indices so the replicated
            # bitset stays identical on every device (see hash_update).
            bundle = hash_update(cfg, bundle, batch.planes, axis_name)
        return bundle, opt_state, metrics

    return train_step


def make_train_step_chunk(cfg: NetConfig, tx=None, axis_name: str | None = None):
    """Build `chunk_step(bundle, opt_state, batches, train_ube) -> ...`.

    `batches` is a Batch of [K, B, ...] arrays; runs K optimizer steps in
    ONE compiled program (`lax.scan`), bit-identical to K sequential
    `train_step` calls.  Returns metrics stacked to [K].  This is the
    remote-accelerator throughput path: per-dispatch latency and the
    per-step metric round-trip are paid once per chunk instead of once per
    step (measured 125 -> ~200 steps/s on the reference config).
    """
    tx = tx or make_optimizer()
    step = make_train_step(cfg, tx, axis_name)

    def chunk_step(bundle, opt_state, batches: Batch, train_ube: bool):
        def body(carry, batch):
            b, o = carry
            b, o, m = step(b, o, batch, train_ube)
            return (b, o), m

        (bundle, opt_state), metrics = jax.lax.scan(
            body, (bundle, opt_state), batches
        )
        return bundle, opt_state, metrics

    return chunk_step
