"""Replay-buffer set analysis -> opening books
(reference visualize_replay_buffer/src/main.rs:150-201).

Samples positions from two replay files, computes the intersection and
the two differences, and writes a secondary sample of each as opening
books (one TPS per line) — used to study which regions of state space two
training runs explored.

Usage:
    python -m takzero_tpu.drivers.visualize_replay_buffer \
        --n 4 a_replays.txt b_replays.txt [--initial 1000000] [--sample 2000]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def sample_positions(n: int, path, limit: int) -> set[str]:
    """First `limit` positions of the replay stream, as TPS strings."""
    from ..data.target import Replay
    from ..tak import engine, state_to_tps

    eng = engine(n)
    out: set[str] = set()
    count = 0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            for state in Replay.from_line(n, line).states(eng):
                out.add(state_to_tps(n, state))
                count += 1
                if count >= limit:
                    return out
    return out


def save_book(path, positions, sample: int, rng: np.random.Generator) -> int:
    positions = sorted(positions)
    if len(positions) > sample:
        idx = rng.choice(len(positions), sample, replace=False)
        positions = [positions[i] for i in idx]
    pathlib.Path(path).write_text("\n".join(positions) + "\n", encoding="utf-8")
    return len(positions)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("replays_a")
    parser.add_argument("replays_b")
    parser.add_argument("--n", type=int, default=4)
    parser.add_argument("--initial", type=int, default=1_000_000)
    parser.add_argument("--sample", type=int, default=2_000)
    parser.add_argument("--seed", type=int, default=12345)
    parser.add_argument("--out-prefix", default="positions")
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    a = sample_positions(args.n, args.replays_a, args.initial)
    b = sample_positions(args.n, args.replays_b, args.initial)
    name_a = pathlib.Path(args.replays_a).stem.replace("_replays", "")
    name_b = pathlib.Path(args.replays_b).stem.replace("_replays", "")
    for label, positions in (
        ("both", a & b),
        (f"only_{name_a}", a - b),
        (f"only_{name_b}", b - a),
    ):
        path = f"{args.out_prefix}_{label}.opening_book"
        count = save_book(path, positions, args.sample, rng)
        print(f"{path}: {count} positions (from {label} = "
              f"{len(positions)})")


if __name__ == "__main__":
    main()
