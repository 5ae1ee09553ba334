"""Minimum end-to-end learning slice (SURVEY.md §7): selfplay -> targets
-> learn -> evaluation showing strength gain over the random-init
checkpoint, at 3x3 scale in a single process.

    python examples/tiny_run.py [--iters 30] [--out tiny_run.json]

Writes a JSON summary: final-vs-initial W/L/D over openings played both
ways, plus the Elo estimate from the native Bradley-Terry fit.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from takzero_tpu.config import NET_PRESETS, selfplay_preset
from takzero_tpu.data.native_loader import make_batch_native
from takzero_tpu.evaluation import make_compete
from takzero_tpu.models.agent import make_net_evaluate, new_agent
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.selfplay import SelfplayEngine
from takzero_tpu.tak import engine
from takzero_tpu.tools.elo import MatchResult, fit_elo
from takzero_tpu.train.data import make_batch, random_pretraining_targets
from takzero_tpu.train.learner import init_opt, make_optimizer, make_train_step


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--moves-per-iter", type=int, default=12)
    parser.add_argument("--steps-per-iter", type=int, default=16)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--pretrain-steps", type=int, default=150)
    parser.add_argument("--eval-games", type=int, default=64)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--size", type=int, default=3)
    parser.add_argument("--half-komi", type=int, default=0)
    parser.add_argument("--filters", type=int, default=16)
    parser.add_argument("--blocks", type=int, default=2)
    parser.add_argument("--budget", type=int, default=48)
    parser.add_argument("--sampled", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--novelty", default="simhash",
                        choices=["simhash", "lcghash", "rnd", "ensemble", "none"])
    parser.add_argument("--rnd-mlp", action="store_true",
                        help="net5-style MLP RND instead of the conv tower")
    parser.add_argument("--beta", type=float, default=0.0,
                        help=">0 turns on exploration (beta on half the batch)")
    parser.add_argument("--out", default="tiny_run.json")
    parser.add_argument("--save-ckpt", default=None,
                        help="write the final bundle here (e.g. for the "
                        "puzzle benchmark driver)")
    args = parser.parse_args(argv)

    from takzero_tpu.models.network import NetConfig
    cfg = NetConfig(n=args.size, half_komi=args.half_komi,
                    filters=args.filters, blocks=args.blocks,
                    novelty=args.novelty, hash_bits=16,
                    rnd_filters=16, rnd_blocks=2, ensemble_size=8,
                    rnd_mlp=args.rnd_mlp)
    eng = engine(cfg.n, half_komi=cfg.half_komi)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()

    bundle = new_agent(cfg, seed=args.seed)
    init_bundle = jax.tree.map(lambda x: x, bundle)  # snapshot
    tx = make_optimizer(args.lr)
    opt_state = init_opt(cfg, tx, bundle)
    train_step = jax.jit(make_train_step(cfg, tx), static_argnames=("train_ube",))

    # Pre-training on random playouts (learn/src/main.rs:425-483).
    pre = random_pretraining_targets(eng, args.batch * args.pretrain_steps, rng)
    for i in range(args.pretrain_steps):
        batch = make_batch(eng, pre[i * args.batch : (i + 1) * args.batch], rng)
        bundle, opt_state, m = train_step(bundle, opt_state, batch, train_ube=False)
    print(f"pretrain done ({time.time()-t0:.0f}s): loss={float(m['loss']):.3f}", flush=True)

    # Selfplay <-> learn.
    from takzero_tpu.selfplay import SelfplayConfig
    sp_cfg = SelfplayConfig(
        batch=args.batch, search_budget=args.budget,
        sampled_actions=args.sampled, beta=args.beta,
        exploration=args.beta > 0,
        max_children=64 if args.size <= 4 else 128, max_depth=40,
    )
    evaluator = make_net_evaluate(cfg, eng)
    sp = SelfplayEngine(eng, sp_cfg, evaluator)
    if cfg.novelty == "rnd":
        from takzero_tpu.models.agent import rnd_update_normalization

        rnd_norm = jax.jit(
            lambda b, e, l: rnd_update_normalization(cfg, b, e, l)
        )
    key, k0 = jax.random.split(key)
    sp.reset(k0)
    buffer: list = []
    losses = []
    for it in range(args.iters):
        for _ in range(args.moves_per_iter):
            key, km = jax.random.split(key)
            targets, _, _ = sp.play_move(bundle, km)
            buffer.extend(targets)
        buffer = buffer[-20_000:]
        if len(buffer) < args.batch:
            continue
        for _ in range(args.steps_per_iter):
            picks = [buffer[i] for i in rng.integers(0, len(buffer), args.batch)]
            # Native (C++) parse path: ~10x the python per-target loop.
            batch = make_batch_native(
                eng, "".join(t.to_line() + "\n" for t in picks), rng
            )
            bundle, opt_state, m = train_step(bundle, opt_state, batch, train_ube=True)
        losses.append(float(m["loss"]))
        if cfg.novelty == "rnd" and it % 10 == 0:
            # Periodic min/max normalization refresh, as the learn driver
            # does every 100 steps (learn/src/rnd_normalization.rs:48-77).
            from takzero_tpu.eee.harness import random_plane_batch
            bundle = rnd_norm(
                bundle,
                random_plane_batch(eng, jax.random.PRNGKey(9), 4, 32),
                random_plane_batch(eng, jax.random.PRNGKey(10), 20, 32),
            )
        print(
            f"iter {it}: buffer={len(buffer)} loss={losses[-1]:.3f} "
            f"({time.time()-t0:.0f}s)",
            flush=True,
        )

    # Final vs initial, both colors from shared random openings.
    compete = make_compete(
        eng, evaluator, sampled_actions=args.sampled,
        search_budget=args.budget,
        max_children=64 if args.size <= 4 else 128, max_depth=40,
    )
    opening = make_new_opening(eng, random_steps=1)
    key, ko, k1, k2 = jax.random.split(key, 4)
    envs = opening(ko, args.eval_games)
    r1 = compete(bundle, init_bundle, envs, k1)  # trained as white
    r2 = compete(init_bundle, bundle, envs, k2)  # trained as black
    wins = r1.wins + r2.losses
    losses_ = r1.losses + r2.wins
    draws = r1.draws + r2.draws
    matches = [
        MatchResult("run", 1, "run", 0, r1.wins, r1.losses, r1.draws),
        MatchResult("run", 0, "run", 1, r2.wins, r2.losses, r2.draws),
    ]
    ratings = fit_elo(matches)
    gain = ratings["run_1"][0] - ratings["run_0"][0]
    summary = {
        "wins": wins,
        "losses": losses_,
        "draws": draws,
        "games": wins + losses_ + draws,
        "elo_gain": round(gain, 1),
        "final_loss": losses[-1] if losses else None,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1)
    if args.save_ckpt:
        import pathlib as _p

        from takzero_tpu.utils import ckpt as _ckpt

        out = _p.Path(args.save_ckpt)
        _ckpt.save_checkpoint(out.parent or _p.Path("."), out.name, bundle)
    return summary


if __name__ == "__main__":
    main()
