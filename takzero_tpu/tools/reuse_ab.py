"""A/B: carried-subtree vs fresh-tree search at equal budget.

The reference always keeps the chosen child's subtree across moves
(node/batched.rs:131-144); on TPU the carried pool costs real search
throughput (see SelfplayConfig.reuse_carry_cap), so whether reuse buys
strength at a given config is an empirical question.  This pits one
bundle against itself — one side descending its tree between moves, the
other rebuilding fresh — over both-color games from shared random
openings, and reports W/L/D + score for the REUSING side.

    python -m takzero_tpu.tools.reuse_ab --ckpt model.ckpt \
        --net net6_simhash [--games 64] [--budget 768] [--sampled 64]
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import jax

from ..config import NET_PRESETS, selfplay_preset
from ..evaluation import make_compete
from ..models.agent import make_net_evaluate, new_agent
from ..search.openings import make_new_opening
from ..tak import engine
from ..utils import ckpt

log = logging.getLogger("reuse_ab")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    p.add_argument("--games", type=int, default=64,
                   help="games per color direction (total = 2x)")
    p.add_argument("--budget", type=int, default=None)
    p.add_argument("--sampled", type=int, default=None)
    p.add_argument("--max-moves", type=int, default=150)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write a JSON summary here")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    net_cfg = NET_PRESETS[args.net]
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    sp = selfplay_preset(
        args.net,
        **{
            k: v
            for k, v in (
                ("search_budget", args.budget),
                ("sampled_actions", args.sampled),
            )
            if v
        },
    )
    bundle = ckpt.load_checkpoint(args.ckpt, new_agent(net_cfg, seed=0))
    evaluator = make_net_evaluate(net_cfg, eng)

    wins = losses = draws = 0
    t0 = time.time()
    for direction, reuse_pair in ((0, (True, False)), (1, (False, True))):
        compete = make_compete(
            eng, evaluator, sp.sampled_actions, sp.search_budget,
            sp.max_children, sp.max_depth, tree_reuse=reuse_pair,
        )
        envs = make_new_opening(eng, random_steps=2)(
            jax.random.PRNGKey(args.seed), args.games
        )
        res = compete(
            bundle, bundle, envs, jax.random.PRNGKey(args.seed + 1),
            max_moves=args.max_moves,
        )
        # `res` scores WHITE; direction 1 has the reusing agent as black.
        w, l, d = (
            (res.wins, res.losses, res.draws)
            if direction == 0
            else (res.losses, res.wins, res.draws)
        )
        wins += w
        losses += l
        draws += d
        log.info(
            "direction %d (reuse as %s): %dW-%dL-%dD",
            direction, "white" if direction == 0 else "black", w, l, d,
        )
    n = wins + losses + draws
    score = (wins + 0.5 * draws) / max(n, 1)
    summary = {
        "net": args.net, "games": n, "budget": sp.search_budget,
        "sampled": sp.sampled_actions, "max_children": sp.max_children,
        "reuse_wins": wins, "reuse_losses": losses, "draws": draws,
        "reuse_score": round(score, 4), "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
