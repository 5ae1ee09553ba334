"""Radial SVG visualization of the search tree
(reference visualize_search/src/main.rs).

Runs a plain PUCT search (batch of one tree) at each beta in
{0, 0.5, 1, 2, 3, 4} from a given TPS position and renders the tree as a
radial SVG: one circle per expanded node (opacity proportional to
visits, TPS in a ``tps`` attribute for hover tooltips), edges fanning
children over the parent's angular sector.

Usage:
    python -m takzero_tpu.drivers.visualize_search --net net4_rnd \
        [--model CKPT] [--tps "..."] [--visits 1000] [--out-dir .]
"""

from __future__ import annotations

import argparse
import math
import pathlib

import numpy as np

ARM_LENGTH = 40.0
CIRCLE_RADIUS = 6.0
COLOR = "#8142f5"

PREVIEW_JS = """
const tip = document.createElementNS('http://www.w3.org/2000/svg','text');
tip.setAttribute('font-size','12'); tip.setAttribute('fill','#111');
document.documentElement.appendChild(tip);
for (const c of document.querySelectorAll('circle')) {
  c.addEventListener('mouseenter', () => {
    tip.textContent = c.getAttribute('tps') || '';
    tip.setAttribute('x', Number(c.getAttribute('cx')) + 10);
    tip.setAttribute('y', Number(c.getAttribute('cy')) - 10);
  });
}
"""


def opacity(visits: int) -> float:
    return max(0.0, min(1.0, visits / 25.0))


def draw_tree(parts, tree, node: int, x: float, y: float, a0: float, a1: float,
              node_visits: int, tps: str, n: int):
    """Recursive radial layout over the host-copied tree arrays."""
    from ..tak import state_to_tps

    parts.append(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{CIRCLE_RADIUS}" fill="{COLOR}" '
        f'opacity="{opacity(node_visits):.3f}" tps="{tps}"/>'
    )
    actions = tree["child_action"][node]
    valid = np.nonzero(actions >= 0)[0]
    if len(valid) == 0:
        return
    step = (a1 - a0) / len(valid)
    for i, slot in enumerate(valid):
        visits = int(tree["child_visit"][node, slot])
        if visits < 1:
            continue
        ang = a0 + step * i
        x2 = x + ARM_LENGTH * math.cos(ang)
        y2 = y + ARM_LENGTH * math.sin(ang)
        parts.append(
            f'<line x1="{x:.1f}" y1="{y:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="{COLOR}" stroke-width="1" opacity="{opacity(visits):.3f}"/>'
        )
        child = int(tree["child_node"][node, slot])
        if child >= 0:
            child_tps = tree["node_tps"][child]
            draw_tree(
                parts, tree, child, x2, y2, ang - step / 2, ang + step / 2,
                visits, child_tps, n,
            )


def visualize(tree_arrays, n: int, beta: float, out_dir) -> pathlib.Path:
    parts = [
        '<svg xmlns="http://www.w3.org/2000/svg" viewBox="-400 -400 1000 1000">'
    ]
    root_visits = int(tree_arrays["root_visit"])
    draw_tree(
        parts, tree_arrays, 0, 0.0, 0.0, 0.0, 2 * math.pi,
        root_visits, tree_arrays["node_tps"][0], n,
    )
    parts.append(f"<script><![CDATA[{PREVIEW_JS}]]></script></svg>")
    path = pathlib.Path(out_dir) / f"tree_with_beta={beta}.svg"
    path.write_text("".join(parts), encoding="utf-8")
    return path


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from ..config import NET_PRESETS
    from ..models.agent import make_net_evaluate, new_agent
    from ..search.core import make_simulate
    from ..search.tree import init_tree
    from ..tak import engine, state_to_tps, tps_to_state
    from ..utils import ckpt

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--net", default="net4_rnd", choices=NET_PRESETS)
    parser.add_argument("--model", help="checkpoint path (default: fresh net)")
    parser.add_argument("--tps", default=None)
    parser.add_argument("--visits", type=int, default=1000)
    parser.add_argument("--betas", default="0,0.5,1,2,3,4")
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--max-children", type=int, default=64)
    args = parser.parse_args(argv)

    cfg = NET_PRESETS[args.net]
    eng = engine(cfg.n, half_komi=cfg.half_komi)
    bundle = new_agent(cfg, seed=0)
    if args.model:
        bundle = ckpt.load_checkpoint(args.model, bundle)
    evaluator = make_net_evaluate(cfg, eng)
    simulate = jax.jit(
        lambda tree, beta: make_simulate(
            eng, lambda envs: evaluator(bundle, envs), max_depth=64
        )(tree, beta)
    )

    if args.tps:
        state = tps_to_state(cfg.n, args.tps)
        envs = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
    else:
        from ..search.openings import make_new_opening

        envs = make_new_opening(eng, random_steps=3)(jax.random.PRNGKey(0), 1)

    for beta in [float(b) for b in args.betas.split(",")]:
        tree = init_tree(eng, envs, args.visits + 8, args.max_children)
        for _ in range(args.visits):
            tree = simulate(tree, jnp.full((1,), beta))
        host = {
            "child_action": np.asarray(tree.child_action[0]),
            "child_visit": np.asarray(tree.child_visit[0]),
            "child_node": np.asarray(tree.child_node[0]),
            "root_visit": np.asarray(tree.root_visit[0]),
        }
        # node_live is the authoritative live set: a prefix bound from
        # node_count is only valid for fresh trees (descend_batch recycles
        # rows in place, so live rows are not a prefix after reuse).
        live = np.asarray(tree.node_live[0])
        host["node_tps"] = [
            state_to_tps(
                cfg.n, jax.tree.map(lambda x: np.asarray(x[0, i]), tree.node_env)
            )
            if live[i]
            else ""
            for i in range(tree.child_action.shape[1])
        ]
        path = visualize(host, cfg.n, beta, args.out_dir)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
