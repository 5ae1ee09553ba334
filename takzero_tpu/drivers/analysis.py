"""Interactive analysis REPL.

Replaces analysis/src/main.rs: enter a move to play it; enter anything
else to run a batch of simulations and print the root action table
(visits, logit, probability, improved policy, q, std-dev, eval) — the
debugging affordance of the reference's node/debug.rs.

Usage: python -m takzero_tpu.drivers.analysis [--net ...] [--model CKPT]
           [--tps "..."] [--example]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NET_PRESETS
from ..models.agent import make_net_evaluate, new_agent
from ..search import eval as ev
from ..search.core import make_kernels
from ..search.policy import improved_policy, select_best_slot, slot_action
from ..search.tree import init_tree
from ..tak import action_to_ptn, engine, ptn_to_action, state_to_tps, tps_to_state
from ..utils import ckpt

SIM_CHUNK = 128


def eval_str(flag, ply, value) -> str:
    if flag == ev.WIN:
        return f"Win({ply})"
    if flag == ev.LOSS:
        return f"Loss({ply})"
    if flag == ev.DRAW:
        return f"Draw({ply})"
    return f"{value:+.4f}"


def print_root_table(n, tree, out=sys.stdout):
    ca = np.asarray(tree.child_action[0, 0])
    order = np.argsort(-np.asarray(tree.child_visit[0, 0]))
    pol = np.asarray(improved_policy(tree, float(tree.child_visit[0, 0].max())))[0]
    print(
        f"root: visits={int(tree.root_visit[0])} "
        f"eval={eval_str(int(tree.root_flag[0]), int(tree.root_ply[0]), float(tree.root_value[0]))} "
        f"std={float(tree.root_std[0]):.4f}",
        file=out,
    )
    header = f"{'move':>8} {'visits':>7} {'logit':>8} {'prob':>7} {'improved':>9} {'q':>8} {'std':>7} {'eval':>10}"
    print(header, file=out)
    for slot in order:
        if ca[slot] < 0:
            continue
        q = float(
            ev.negated_float(
                tree.child_flag[0, 0, slot],
                tree.child_ply[0, 0, slot],
                tree.child_value[0, 0, slot],
            )
        )
        print(
            f"{action_to_ptn(n, int(ca[slot])):>8}"
            f" {int(tree.child_visit[0, 0, slot]):>7}"
            f" {float(tree.child_logit[0, 0, slot]):>8.3f}"
            f" {float(tree.child_prob[0, 0, slot]):>7.4f}"
            f" {pol[slot]:>9.4f}"
            f" {q:>8.4f}"
            f" {float(tree.child_std[0, 0, slot]):>7.4f}"
            f" {eval_str(int(tree.child_flag[0, 0, slot]), int(tree.child_ply[0, 0, slot]), float(tree.child_value[0, 0, slot])):>10}",
            file=out,
        )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--model", default=None)
    parser.add_argument("--tps", default=None)
    parser.add_argument("--example", action="store_true")
    args = parser.parse_args(argv)

    cfg = NET_PRESETS[args.net]
    eng = engine(cfg.n, half_komi=cfg.half_komi)
    bundle = new_agent(cfg, seed=0)
    if args.model:
        bundle = ckpt.load_checkpoint_partial(args.model, bundle)
    evaluator = make_net_evaluate(cfg, eng)

    def run_chunk(tree, bundle):
        # Root init + virtual-visit batched sims: one NN call per chunk.
        simulate, simulate_batch = make_kernels(
            eng, lambda e: evaluator(bundle, e), max_depth=64
        )
        tree = simulate(tree, jnp.zeros(1))
        return simulate_batch(tree, jnp.zeros(1), SIM_CHUNK - 1)

    run = jax.jit(run_chunk)
    state = tps_to_state(cfg.n, args.tps) if args.tps else eng.initial()

    def fresh_tree(state):
        envs = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
        return init_tree(eng, envs, 1 << 13, 256 if cfg.n >= 6 else 128)

    tree = fresh_tree(state)
    if args.example:
        for _ in range(8):
            tree = run(tree, bundle)
            print_root_table(cfg.n, tree)
            slot = select_best_slot(tree)
            action = int(np.asarray(slot_action(tree, slot))[0])
            print(f"playing {action_to_ptn(cfg.n, action)}")
            state = eng.step_jit(state, action)
            print(state_to_tps(cfg.n, state))
            if int(eng.game_result_jit(state)) != -1:
                break
            tree = fresh_tree(state)
        return

    print(state_to_tps(cfg.n, state))
    for line in sys.stdin:
        line = line.strip()
        if line in ("quit", "exit"):
            break
        try:
            action = ptn_to_action(cfg.n, line)
            legal = np.asarray(eng.legal_mask_jit(state))
            if not legal[action]:
                print("illegal move")
                continue
            state = eng.step_jit(state, action)
            tree = fresh_tree(state)
            print(state_to_tps(cfg.n, state))
        except ValueError:
            tree = run(tree, bundle)
            print_root_table(cfg.n, tree)


if __name__ == "__main__":
    main()
