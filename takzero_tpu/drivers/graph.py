"""Replay-buffer uniqueness curves (reference graph/src/main.rs).

For each replay file, walks every position of every replay in order and
computes the "Yaniv metric": per chunk of ``point_rate`` positions, the
fraction that were never seen before (new-unique / positions).  Prints a
Python-literal point list per run (like the reference) and renders all
curves into a self-contained ``graph.html`` (inline SVG — no chart
library needed).

Usage:
    python -m takzero_tpu.drivers.graph --n 4 run1_replays.txt run2_replays.txt
"""

from __future__ import annotations

import argparse
import html
import pathlib


def unique_position_curve(
    n: int, path, positions_cap: int = 10_000_000, point_rate: int = 250_000
):
    """[(positions, new_unique_fraction)] — streams TPS strings per ply.

    Positions are keyed by literal TPS (the reference keys full game
    states, commented canonical(); graph/src/main.rs:84-89).
    """
    from ..data.target import Replay
    from ..tak import engine, state_to_tps

    eng = engine(n)
    max_points = positions_cap // point_rate
    seen: set[str] = set()
    points = [(0.0, 1.0)]
    count = prev_count = prev_unique = 0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if count // point_rate >= len(points):
                diff = count - prev_count
                points.append((float(count), (len(seen) - prev_unique) / diff))
                prev_count, prev_unique = count, len(seen)
            if len(points) > max_points:
                break
            replay = Replay.from_line(n, line)
            for state in replay.states(eng):
                seen.add(state_to_tps(n, state))
                count += 1
    return points


def render_html(curves: dict[str, list], out_path, width=1200, height=800) -> None:
    """Self-contained SVG line chart with legend."""
    pad = 60
    xs = [x for pts in curves.values() for x, _ in pts]
    ys = [y for pts in curves.values() for _, y in pts]
    xmax = max(xs) if xs else 1.0
    ymax = max(ys) if ys else 1.0
    colors = ["#c1232b", "#27727b", "#fcce11", "#e87c25", "#b5c334", "#6a3d9a"]

    def sx(x):
        return pad + (width - 2 * pad) * (x / max(xmax, 1e-9))

    def sy(y):
        return height - pad - (height - 2 * pad) * (y / max(ymax, 1e-9))

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<line x1="{pad}" y1="{height-pad}" x2="{width-pad}" y2="{height-pad}" stroke="#333"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height-pad}" stroke="#333"/>',
        f'<text x="{width//2}" y="{height-15}" text-anchor="middle">positions</text>',
        f'<text x="15" y="{height//2}" transform="rotate(-90 15 {height//2})" '
        f'text-anchor="middle">new unique / positions</text>',
    ]
    for i in range(5):
        y = ymax * i / 4
        parts.append(
            f'<text x="{pad-8}" y="{sy(y)+4}" text-anchor="end" font-size="11">'
            f"{y:.2f}</text>"
        )
    for i, (name, pts) in enumerate(curves.items()):
        color = colors[i % len(colors)]
        poly = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in pts)
        parts.append(
            f'<polyline points="{poly}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
        ly = pad + 20 * i
        parts.append(
            f'<rect x="{width-pad-180}" y="{ly-10}" width="12" height="12" fill="{color}"/>'
            f'<text x="{width-pad-160}" y="{ly}" font-size="13">{html.escape(name)}</text>'
        )
    parts.append("</svg>")
    pathlib.Path(out_path).write_text(
        "<!DOCTYPE html><html><body>" + "".join(parts) + "</body></html>",
        encoding="utf-8",
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("replays", nargs="+", help="replay files")
    parser.add_argument("--n", type=int, default=4)
    parser.add_argument("--positions", type=int, default=10_000_000)
    parser.add_argument("--point-rate", type=int, default=250_000)
    parser.add_argument("--out", default="graph.html")
    parser.add_argument("--png", default=None,
                        help="also render a matplotlib figure (the "
                        "figures/replay_buffer_uniqueness.png analog)")
    parser.add_argument("--csv", default=None,
                        help="also write name,positions,unique_fraction rows")
    args = parser.parse_args(argv)

    curves = {}
    for path in args.replays:
        name = pathlib.Path(path).stem.replace("_replays", "")
        pts = unique_position_curve(
            args.n, path, positions_cap=args.positions, point_rate=args.point_rate
        )
        curves[name] = pts
        print(f"{name} = [")
        for x, y in pts:
            print(f"    ({x}, {y}),")
        print("]")
    render_html(curves, args.out)
    print(f"wrote {args.out}")
    if args.csv:
        with open(args.csv, "w", encoding="utf-8") as f:
            f.write("run,positions,unique_fraction\n")
            for name, pts in curves.items():
                for x, y in pts:
                    f.write(f"{name},{int(x)},{y:.6f}\n")
        print(f"wrote {args.csv}")
    if args.png:
        from ..tools.plots import plot_uniqueness

        plot_uniqueness(curves, args.png)
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
