"""EEE hash-novelty generalization experiment (eee/src/generalization.rs).

Same harness as the RND experiment, but the "estimator" is a SimHash or
LCG-hash count bitset: each step marks a replay-position batch as seen
(scatter-OR into the device bitset) and records the mean novelty
(0..MAXIMUM_VARIANCE) of the training batch before/after and of the fixed
reference batches.  The reference swaps estimators by editing an import
(README.md:115); here it is the `novelty` config field.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.agent import hash_novelty, hash_update, new_agent
from ..models.network import NetConfig
from ..tak import engine
from .harness import planes_of, reference_batches, replay_positions
from .rnd import CSV_HEADER, REF_NAMES


def make_hash_step(cfg: NetConfig):
    def step(bundle, train_planes, refs):
        metrics = {"current": jnp.mean(hash_novelty(cfg, bundle, train_planes))}
        bundle = hash_update(cfg, bundle, train_planes)
        metrics["after"] = jnp.mean(hash_novelty(cfg, bundle, train_planes))
        for name in REF_NAMES:
            metrics[name] = jnp.mean(hash_novelty(cfg, bundle, refs[name]))
        return bundle, metrics

    return jax.jit(step)


def run(
    replay_file,
    out_csv,
    n: int = 4,
    half_komi: int = 4,
    novelty: str = "simhash",
    hash_bits: int = 26,
    steps: int = 45_000,
    batch_size: int = 256,
    forced_uses: int = 4,
    seed: int = 432,
    log_every: int = 100,
):
    assert novelty in ("simhash", "lcghash")
    cfg = NetConfig(n=n, half_komi=half_komi, novelty=novelty, hash_bits=hash_bits)
    eng = engine(n, half_komi=half_komi)
    rng = np.random.default_rng(seed)
    bundle = new_agent(cfg, seed=seed)
    # Only the hash state is exercised; drop network params to save memory.
    bundle = {k: v for k, v in bundle.items() if not k.startswith(("params", "batch"))}
    step_fn = make_hash_step(cfg)

    positions, unique_by_ply, seen = [], {}, set()
    for state, ply, tps in replay_positions(
        eng, replay_file, limit=steps * batch_size // 10
    ):
        positions.append(state)
        if tps not in seen:
            seen.add(tps)
            unique_by_ply.setdefault(ply, []).append(state)
    refs = reference_batches(
        eng, unique_by_ply, jax.random.PRNGKey(seed), batch_size
    )

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
                    pos_iter = iter(positions)
            rng.shuffle(buffer)
            batch = buffer[-batch_size:]
            del buffer[-batch_size:]
            buffer.extend([s, u - 1] for s, u in batch if u > 1)
            envs = jax.tree.map(jnp.asarray, stack_states([s for s, _ in batch]))
            planes = planes_of(eng, envs)
            bundle, metrics = step_fn(bundle, planes, refs)
            m = {k: float(v) for k, v in metrics.items()}
            rows.append(m)
            f.write(
                f"{step},{m['current']},{m['after']},{m['early']},{m['late']},"
                f"{m['random_early']},{m['random_late']},{m['impossible_early']}\n"
            )
            if step % log_every == 0:
                f.flush()
                print(f"step: {step:>8}")
    return rows
