"""EEE experiment driver — offline novelty-estimator studies.

Replaces the reference's eee binaries (eee/src/{rnd,generalization,
ensemble,seen_ratio}.rs) with one CLI:

    python -m takzero_tpu.drivers.eee rnd --replays replays.txt
    python -m takzero_tpu.drivers.eee generalization --replays replays.txt \
        --novelty simhash|lcghash
    python -m takzero_tpu.drivers.eee ensemble --targets targets.txt
    python -m takzero_tpu.drivers.eee seen-ratio --model model.ckpt \
        --net net6_simhash

Each writes ``eee_data.csv`` (rnd/generalization/ensemble) or prints a
Python-literal ratio list (seen-ratio), matching the reference's outputs
so its plotting scripts keep working.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    common = dict(n=4, half_komi=4)

    p = sub.add_parser("rnd")
    p.add_argument("--replays", required=True)
    p.add_argument("--out", default="eee_data.csv")
    p.add_argument("--n", type=int, default=common["n"])
    p.add_argument("--half-komi", type=int, default=common["half_komi"])
    p.add_argument("--steps", type=int, default=45_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=432)
    p.add_argument("--rnd-mlp", action="store_true")

    p = sub.add_parser("generalization")
    p.add_argument("--replays", required=True)
    p.add_argument("--out", default="eee_data.csv")
    p.add_argument("--n", type=int, default=common["n"])
    p.add_argument("--half-komi", type=int, default=common["half_komi"])
    p.add_argument("--novelty", default="simhash", choices=("simhash", "lcghash"))
    p.add_argument("--hash-bits", type=int, default=26)
    p.add_argument("--steps", type=int, default=45_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=432)

    p = sub.add_parser("ensemble")
    p.add_argument("--targets", required=True)
    p.add_argument("--out", default="eee_data.csv")
    p.add_argument("--n", type=int, default=common["n"])
    p.add_argument("--half-komi", type=int, default=common["half_komi"])
    p.add_argument("--steps", type=int, default=3_000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--filters", type=int, default=256)
    p.add_argument("--blocks", type=int, default=16)
    p.add_argument("--ensemble-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=1_234_567)

    p = sub.add_parser("seen-ratio")
    p.add_argument("--model", required=True)
    p.add_argument("--net", default="net6_simhash")
    p.add_argument("--max-ply", type=int, default=100)
    p.add_argument("--batch", type=int, default=65_536)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--csv", default=None, help="write ply,unseen_ratio rows")
    p.add_argument("--png", default=None,
                   help="figures/local_novelty_per_depth.png analog")

    args = parser.parse_args(argv)

    if args.cmd == "rnd":
        from ..eee.rnd import run

        run(
            args.replays,
            args.out,
            n=args.n,
            half_komi=args.half_komi,
            steps=args.steps,
            batch_size=args.batch_size,
            seed=args.seed,
            rnd_mlp=args.rnd_mlp,
        )
    elif args.cmd == "generalization":
        from ..eee.generalization import run

        run(
            args.replays,
            args.out,
            n=args.n,
            half_komi=args.half_komi,
            novelty=args.novelty,
            hash_bits=args.hash_bits,
            steps=args.steps,
            batch_size=args.batch_size,
            seed=args.seed,
        )
    elif args.cmd == "ensemble":
        from ..eee.ensemble import run

        run(
            args.targets,
            args.out,
            n=args.n,
            half_komi=args.half_komi,
            steps=args.steps,
            batch_size=args.batch_size,
            filters=args.filters,
            blocks=args.blocks,
            ensemble_size=args.ensemble_size,
            seed=args.seed,
        )
    elif args.cmd == "seen-ratio":
        from ..config import NET_PRESETS
        from ..eee.seen_ratio import run
        from ..models.agent import new_agent
        from ..utils import ckpt

        cfg = NET_PRESETS[args.net]
        bundle = ckpt.load_checkpoint(args.model, new_agent(cfg, seed=0))
        pairs = run(
            bundle, cfg, max_ply=args.max_ply, batch=args.batch,
            seed=args.seed,
        )
        if args.csv:
            with open(args.csv, "w", encoding="utf-8") as f:
                f.write("ply,unseen_ratio\n")
                f.writelines(f"{p},{r}\n" for p, r in pairs)
        if args.png:
            from ..tools.plots import plot_seen_ratio

            plot_seen_ratio(pairs, args.png)


if __name__ == "__main__":
    main()
