"""EEE ensemble experiment (reference eee/src/ensemble.rs).

Trains the full net (policy / value / detached UBE) plus the extra
ensemble value heads on saved targets, with the ensemble's own targets
bootstrapped on-policy: for each position, sample an action from the
improved-policy target, step, and use ``-gamma * ensemble(next)`` per
head — replaced by the exact negated terminal eval when the next position
is terminal (ensemble.rs:265-316).  Loss = policy CE + value MSE + UBE
MSE + ensemble MSE (ensemble.rs:318-351).

Tracked per step: mean per-position variance across heads on the training
batch (before/after the step) and on the fixed reference batches.  (The
reference logs the variance of the whole [B, E] tensor; per-position head
variance is the quantity the agent actually uses as uncertainty, so we
log its batch mean instead.)

Everything after batch assembly — next-state sampling, stepping,
bootstrap, fwd/bwd — is one jitted XLA program.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.target import Target
from ..models.agent import new_agent
from ..models.network import MAXIMUM_VARIANCE, EnsembleHeads, NetConfig, TakNet
from ..search import eval as ev
from ..tak import engine
from ..train.data import make_batch
from ..train.learner import MINIMUM_UBE_TARGET, Batch, F32_MIN
from .harness import reference_batches
from .rnd import CSV_HEADER, REF_NAMES


def _ensemble_forward(cfg: NetConfig, bundle, planes):
    from ..models.agent import _core_only

    core = _core_only(cfg, bundle, planes)
    return EnsembleHeads(cfg).apply({"params": bundle["ensemble_params"]}, core)


def make_ensemble_step(cfg: NetConfig, eng, tx):
    model = TakNet(cfg)
    from ..ops.repr import state_to_planes

    step_env = jax.vmap(eng.step)
    term_kind = jax.vmap(eng.terminal_kind)
    planes_b = jax.vmap(lambda s: state_to_planes(eng, s))

    def head_var(bundle, planes):
        return jnp.mean(jnp.var(_ensemble_forward(cfg, bundle, planes), axis=-1))

    def step(bundle, opt_state, batch: Batch, states, key, refs):
        # --- ensemble bootstrap targets (no grad) ---
        act = jax.random.categorical(
            key, jnp.log(jnp.maximum(batch.policy, 1e-30)), axis=-1
        )
        nxt = step_env(states, act)
        nxt_planes = planes_b(nxt)
        tk = term_kind(nxt)
        heads_next = _ensemble_forward(cfg, bundle, nxt_planes)
        bootstrap = -ev.DISCOUNT * heads_next
        term_val = ev.negated_float(tk, jnp.zeros_like(tk), jnp.zeros_like(batch.value))
        target_ens = jnp.where((tk != 0)[:, None], term_val[:, None], bootstrap)
        target_ens = jax.lax.stop_gradient(target_ens)

        metrics = {"current": head_var(bundle, batch.planes)}

        def loss_fn(trainable):
            params, ens_params = trainable
            (policy, value, ube, core), mut = model.apply(
                {"params": params, "batch_stats": bundle["batch_stats"]},
                batch.planes,
                train=True,
                with_core=True,
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
            loss_ube = jnp.mean((target_ube - ube) ** 2)
            # The reference hands the ensemble heads the SAME train-mode
            # core as the other heads, DETACHED (net4_ensemble.rs:153
            # core.detach()): no second tower forward, no grads into the
            # tower, batch-stat normalization identical to the heads'.
            heads = EnsembleHeads(cfg).apply(
                {"params": ens_params}, jax.lax.stop_gradient(core)
            )
            loss_ens = jnp.mean((target_ens - heads) ** 2)
            loss = loss_policy + loss_value + loss_ube + loss_ens
            aux = (
                mut["batch_stats"],
                {
                    "loss": loss,
                    "loss_policy": loss_policy,
                    "loss_value": loss_value,
                    "loss_ube": loss_ube,
                    "loss_ensemble": loss_ens,
                },
            )
            return loss, aux

        trainable = (bundle["params"], bundle["ensemble_params"])
        (_, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        params, ens_params = optax.apply_updates(trainable, updates)
        bundle = {
            **bundle,
            "params": params,
            "ensemble_params": ens_params,
            "batch_stats": new_stats,
        }

        metrics.update(losses)
        metrics["after"] = head_var(bundle, batch.planes)
        for name in REF_NAMES:
            metrics[name] = head_var(bundle, refs[name])
        return bundle, opt_state, metrics

    return jax.jit(step)


def run(
    target_file,
    out_csv,
    n: int = 4,
    half_komi: int = 4,
    steps: int = 3_000,
    batch_size: int = 128,
    learning_rate: float = 1e-4,
    forced_uses: int = 4,
    ensemble_size: int = 16,
    filters: int = 256,
    blocks: int = 16,
    seed: int = 1_234_567,
    take: int = 320_000,
    log_every: int = 100,
):
    cfg = NetConfig(
        n=n,
        half_komi=half_komi,
        filters=filters,
        blocks=blocks,
        novelty="ensemble",
        ensemble_size=ensemble_size,
    )
    eng = engine(n, half_komi=half_komi)
    rng = np.random.default_rng(seed)
    bundle = new_agent(cfg, seed=seed % (2**31))
    tx = optax.adam(learning_rate)
    opt_state = tx.init((bundle["params"], bundle["ensemble_params"]))
    step_fn = make_ensemble_step(cfg, eng, tx)

    # Two forced-uses pools, as the reference splits targets.txt in half
    # (selfplay-like and reanalyze-like, ensemble.rs:43-54).
    targets: list[Target] = []
    with open(target_file, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                targets.append(Target.from_line(n, line))
            if len(targets) >= 2 * take:
                break
    half = len(targets) // 2
    pools = [
        [[t, forced_uses] for t in targets[:half]],
        [[t, forced_uses] for t in targets[half:]],
    ]

    unique_by_ply: dict[int, list] = {}
    seen: set = set()
    from ..tak import tps_to_state

    for t in targets:
        if t.tps not in seen:
            seen.add(t.tps)
            state = tps_to_state(n, t.tps)
            unique_by_ply.setdefault(int(np.asarray(state.ply)), []).append(state)
    refs = reference_batches(
        eng, unique_by_ply, jax.random.PRNGKey(seed % (2**31)), batch_size
    )

    rows = []
    with open(out_csv, "w", encoding="utf-8") as f:
        f.write(CSV_HEADER + "\n")
        for step in range(steps):
            if any(len(p) < batch_size // 2 for p in pools):
                break
            picked = []
            for pool in pools:
                rng.shuffle(pool)
                batch_part = pool[-batch_size // 2 :]
                del pool[-batch_size // 2 :]
                pool.extend([t, u - 1] for t, u in batch_part if u > 1)
                picked.extend(t for t, _ in batch_part)
            batch, states = make_batch(eng, picked, rng, return_states=True)
            key = jax.random.fold_in(jax.random.PRNGKey(seed % (2**31)), step)
            bundle, opt_state, metrics = step_fn(
                bundle, opt_state, batch, states, key, refs
            )
            m = {k: float(v) for k, v in metrics.items()}
            rows.append(m)
            f.write(
                f"{step},{m['current']},{m['after']},{m['early']},{m['late']},"
                f"{m['random_early']},{m['random_late']},{m['impossible_early']}\n"
            )
            if step % log_every == 0:
                f.flush()
                print(f"step {step}  loss={m['loss']:.4f}")
    return rows
