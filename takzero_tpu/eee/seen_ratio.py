"""EEE seen-ratio scan (reference eee/src/seen_ratio.rs).

For a trained hash-novelty agent, measures the fraction of random-game
positions already in the seen-set as a function of ply: at each ply
0..max_ply, generate `batch` random games and report
mean(novelty)/MAXIMUM_VARIANCE (1.0 = everything unseen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.agent import hash_novelty
from ..models.network import MAXIMUM_VARIANCE, NetConfig
from ..tak import engine
from .harness import random_plane_batch


def run(
    bundle,
    cfg: NetConfig,
    max_ply: int = 100,
    batch: int = 65_536,
    seed: int = 123,
):
    """Returns [(ply, unseen_ratio)]; prints a Python-literal list like the
    reference (seen_ratio.rs:21-28)."""
    eng = engine(cfg.n, half_komi=cfg.half_komi)
    ratio_fn = jax.jit(
        lambda b, planes: jnp.mean(hash_novelty(cfg, b, planes)) / MAXIMUM_VARIANCE
    )
    out = []
    print("random = [")
    for ply in range(max_ply):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), ply)
        planes = random_plane_batch(eng, key, ply, batch)
        ratio = float(ratio_fn(bundle, planes))
        out.append((ply, ratio))
        print(f"    ({ply}, {ratio}),")
    print("]")
    return out
