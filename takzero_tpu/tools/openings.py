"""Opening-book generation (reference python/generate_openings.py).

Enumerates all flat-placement-only openings to a given depth, dedupes by
canonical form (minimum TPS over the 8 board symmetries), and prints one
TPS per line — the opening-book format the evaluation driver reads.
"""

from __future__ import annotations

import numpy as np

from ..tak import engine, state_to_tps
from ..tak.oracle import Oracle
from ..tak.symmetry import transform_state_np


def canonical_tps(n: int, state) -> str:
    return min(state_to_tps(n, transform_state_np(n, state, t)) for t in range(8))


def generate_openings(n: int, half_komi: int, depth: int) -> list[str]:
    eng = engine(n, half_komi=half_komi)
    orc = Oracle(n, half_komi, eng.reversible_limit)
    from ..tak.state import initial_state

    import jax

    start = jax.tree.map(np.asarray, initial_state(n))
    seen: dict[str, object] = {}

    def expand(state, d):
        if d <= 0:
            seen.setdefault(canonical_tps(n, state), state)
            return
        legal = np.nonzero(orc.legal_mask(state))[0]
        # Flat placements only: action index == square for channel 0.
        for a in legal[legal < n * n]:
            expand(orc.step(state, int(a)), d - 1)

    expand(start, depth)
    return sorted(seen)


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", type=int, default=4)
    parser.add_argument("--half-komi", type=int, default=4)
    parser.add_argument("--depth", type=int, default=3)
    parser.add_argument("--out", help="write to file instead of stdout")
    args = parser.parse_args(argv)
    lines = generate_openings(args.size, args.half_komi, args.depth)
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"{len(lines)} openings -> {args.out}")
    else:
        print(text, end="")


if __name__ == "__main__":
    main()
