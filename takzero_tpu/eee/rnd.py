"""EEE RND experiment (reference eee/src/rnd.rs).

Trains a standalone RND predictor against its frozen target on replay
positions (Adam 1e-4, batch 256, forced-uses-4 buffer; rnd.rs:24-28) and
tracks the *normalized surprise* — per-position squared predictor error,
scaled by MAXIMUM_VARIANCE / std(train-batch error) — on fixed held-out
batches: current/after (the training batch before/after the step), early,
late, random_early, random_late, impossible_early.  Appends one CSV row
per step in the reference's column layout (rnd.rs:322-340).

Where the reference computes per-element error tensors, we use the
per-position feature-summed squared error throughout (the quantity
`normalized_rnd` itself uses) — including for early/late, which the
reference leaves unsquared (rnd.rs:238-248, a quirk not worth keeping).

The whole step — six evaluation forwards + the training fwd/bwd — is one
jitted XLA program; positions stream from the replay file on host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.network import MAXIMUM_VARIANCE, NetConfig, RndPair
from ..tak import engine
from .harness import planes_of, reference_batches, replay_positions

CSV_HEADER = "step,current,after,early,late,random_early,random_late,impossible_early"
REF_NAMES = ("early", "late", "random_early", "random_late", "impossible_early")


def make_rnd_step(cfg: NetConfig, tx):
    """Jitted (vars, opt_state, train_planes, refs) -> (vars, opt, metrics)."""
    model = RndPair(cfg)

    def err(variables, planes, train=False):
        if train:
            e, mut = model.apply(
                variables, planes, train=True, mutable=["batch_stats"]
            )
            return e, mut["batch_stats"]
        return model.apply(variables, planes, train=False)

    def step(variables, opt_state, train_planes, refs):
        current = err(variables, train_planes)
        stdev = jnp.maximum(jnp.std(current), 1e-8)
        scale = MAXIMUM_VARIANCE / stdev

        def loss_fn(params):
            vs = {"params": params, "batch_stats": variables["batch_stats"]}
            e, new_stats = err(vs, train_planes, train=True)
            return jnp.mean(e), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        variables = {"params": params, "batch_stats": new_stats}

        metrics = {"current": jnp.mean(current) * scale, "loss": loss}
        metrics["after"] = jnp.mean(err(variables, train_planes)) * scale
        for name in REF_NAMES:
            metrics[name] = jnp.mean(err(variables, refs[name])) * scale
        return variables, opt_state, metrics

    return jax.jit(step)


def run(
    replay_file,
    out_csv,
    n: int = 4,
    half_komi: int = 4,
    steps: int = 45_000,
    batch_size: int = 256,
    learning_rate: float = 1e-4,
    forced_uses: int = 4,
    seed: int = 432,
    log_every: int = 100,
    rnd_mlp: bool = False,
):
    cfg = NetConfig(n=n, half_komi=half_komi, novelty="rnd", rnd_mlp=rnd_mlp)
    eng = engine(n, half_komi=half_komi)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    model = RndPair(cfg)
    from ..ops.repr import input_channels

    dummy = jnp.zeros((1, input_channels(n), n, n), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    tx = optax.adam(learning_rate)
    opt_state = tx.init(variables["params"])
    step_fn = make_rnd_step(cfg, tx)

    # Stream replay positions; collect uniques for the reference batches.
    positions, unique_by_ply, seen = [], {}, set()
    for state, ply, tps in replay_positions(
        eng, replay_file, limit=steps * batch_size // 10
    ):
        positions.append(state)
        if tps not in seen:
            seen.add(tps)
            unique_by_ply.setdefault(ply, []).append(state)
    refs = reference_batches(eng, unique_by_ply, key, batch_size)

    from ..train.data import stack_states

    buffer: list = []
    pos_iter = iter(positions)
    rows = []
    with open(out_csv, "w", encoding="utf-8") as f:
        f.write(CSV_HEADER + "\n")
        for step in range(steps):
            while len(buffer) < max(1024, batch_size):
                try:
                    buffer.append([next(pos_iter), forced_uses])
                except StopIteration:
                    pos_iter = iter(positions)  # recycle if the file is short
            rng.shuffle(buffer)
            batch = buffer[-batch_size:]
            del buffer[-batch_size:]
            buffer.extend([s, u - 1] for s, u in batch if u > 1)
            envs = jax.tree.map(jnp.asarray, stack_states([s for s, _ in batch]))
            planes = planes_of(eng, envs)
            variables, opt_state, metrics = step_fn(
                variables, opt_state, planes, refs
            )
            m = {k: float(v) for k, v in metrics.items()}
            rows.append(m)
            f.write(
                f"{step},{m['current']},{m['after']},{m['early']},{m['late']},"
                f"{m['random_early']},{m['random_late']},{m['impossible_early']}\n"
            )
            if step % log_every == 0:
                f.flush()
                print(f"step: {step:>8}  loss={m['loss']:.4f}")
    return rows
