"""Evaluation driver: round-robin pit fighter over checkpoints.

Replaces evaluation/src/main.rs: scan the model directory for numbered
checkpoints, sample two, play both colors from a batch of random (or
book) openings, and log ``{a} vs. {b}: Evaluation {{ wins, losses,
draws }} {rate}%`` lines for the Elo tooling.

Usage:
    python -m takzero_tpu.drivers.evaluation --model-path DIR [--net ...]
        [--opening-book FILE] [--games N] [--step K] [--rounds N]
"""

from __future__ import annotations

import argparse
import logging
import pathlib
import re
import time

import jax
import numpy as np

from ..config import NET_PRESETS
from ..evaluation import make_compete
from ..parallel import mesh as pm
from ..models.agent import make_net_evaluate, new_agent
from ..search.openings import make_new_opening
from ..tak import engine, tps_to_state
from ..train.data import stack_states
from ..utils import ckpt, watchdog

log = logging.getLogger("evaluation")
_NUMBERED = re.compile(r"model_(\d+)\.ckpt$")


def scan_checkpoints(model_path, step: int) -> list[pathlib.Path]:
    paths = sorted(
        p for p in pathlib.Path(model_path).iterdir() if _NUMBERED.search(p.name)
    )
    return paths[::step]


def build_openings(eng, n_games, rng, opening_book=None):
    if opening_book:
        lines = pathlib.Path(opening_book).read_text().splitlines()
        idx = rng.integers(0, len(lines), n_games)
        states = [tps_to_state(eng.n, lines[i]) for i in idx]
        return jax.tree.map(jax.numpy.asarray, stack_states(states))
    # Random 2-3 extra plies (evaluation:199-205).
    steps = int(rng.integers(2, 4))
    opening = make_new_opening(eng, random_steps=steps)
    return opening(jax.random.PRNGKey(int(rng.integers(2**31))), n_games)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--opening-book", default=None)
    parser.add_argument("--step", type=int, default=1, help="take every k-th ckpt")
    parser.add_argument("--games", type=int, default=64)
    parser.add_argument("--budget", type=int, default=768)
    parser.add_argument("--sampled", type=int, default=64)
    parser.add_argument("--max-moves", type=int, default=200)
    parser.add_argument("--rounds", type=int, default=None, help="for tests")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--pair",
        default=None,
        metavar="A.ckpt,B.ckpt",
        help="play exactly this checkpoint pair (both colors) and exit — "
        "lets a supervisor (tools/elo_curve.py) bound each subprocess's "
        "lifetime so the remote-backend RSS leak cannot accumulate "
        "(round-4 oom postmortem in utils/watchdog.py)",
    )
    parser.add_argument(
        "--rss-limit-gb",
        type=float,
        default=48.0,
        help="hard-exit (code 42) when host RSS exceeds this; 0 disables",
    )
    parser.add_argument(
        "--fresh-tree", action="store_true",
        help="disable cross-move tree reuse for both agents",
    )
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="shard the game batch over the first N visible devices under "
        "a dp mesh, both models replicated (same layout as "
        "drivers/selfplay.py --devices; tree inits follow the env "
        "sharding through eager propagation)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    watchdog.start_rss_watchdog(args.rss_limit_gb)

    net_cfg = NET_PRESETS[args.net]
    eng = engine(net_cfg.n, half_komi=net_cfg.half_komi)
    mesh = None
    if args.devices:
        mesh = pm.driver_mesh(parser, args.devices, args.games, log, "--games")
    seed = args.seed if args.seed is not None else int(time.time())
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    evaluator = make_net_evaluate(net_cfg, eng)
    compete = make_compete(
        eng, evaluator, args.sampled, args.budget,
        max_children=256 if net_cfg.n >= 6 else 128,
        tree_reuse=not args.fresh_tree,
    )
    template = new_agent(net_cfg, seed=0)

    rounds = 0
    max_rounds = 1 if args.pair else args.rounds
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        if args.pair:
            na, nb = args.pair.split(",")
            pa = pathlib.Path(args.model_path) / na
            pb = pathlib.Path(args.model_path) / nb
        else:
            paths = scan_checkpoints(args.model_path, args.step)
            if len(paths) < 2:
                if max_rounds is not None:
                    log.info("too few models (%d), stopping", len(paths))
                    return
                log.info("too few models, sleeping 600s")
                time.sleep(600)
                continue
            pa, pb = (paths[i] for i in rng.choice(len(paths), 2, replace=False))
        try:
            a = ckpt.load_checkpoint_partial(pa, template)
            b = ckpt.load_checkpoint_partial(pb, template)
        except Exception as e:
            if args.pair:
                raise  # supervisor must see a nonzero exit, not silence
            log.warning("cannot load %s/%s: %s", pa, pb, e)
            continue

        envs = build_openings(eng, args.games, rng, args.opening_book)
        if mesh is not None:
            a = pm.replicate(mesh, a)
            b = pm.replicate(mesh, b)
            envs = pm.shard_batch(mesh, envs)
        key, k1, k2 = jax.random.split(key, 3)
        r1 = compete(a, b, envs, k1, args.max_moves)
        log.info("%s vs. %s: %s %.1f%%", pa.name, pb.name, r1, r1.win_rate() * 100)
        r2 = compete(b, a, envs, k2, args.max_moves)
        log.info("%s vs. %s: %s %.1f%%", pb.name, pa.name, r2, r2.win_rate() * 100)


if __name__ == "__main__":
    main()
