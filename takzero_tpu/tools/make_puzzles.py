"""Generate a tinue puzzle database with the reference's schema.

The reference consumes an externally-built SQLite DB of 6x6 tinue
(win-in-N) and tinue-avoidance puzzles (puzzle/src/main.rs:132-166); this
tool builds one natively: random games played by the C++ oracle provide
candidate positions, and the device-side exact solver (dummy-agent
batched MCTS — pure win/loss/draw proving) labels them:

* tinue depth d (odd): root proven Win(d); solution = a child proven
  Loss(d-1);
* tinue avoidance depth d (even): root not proven, every child except
  exactly one proven Win (a loss for the mover); solution = the survivor;
  d = deepest threatened win + 1.

Schema matches the queries in drivers/puzzle.py: ``games(id, size)`` and
``puzzles(game_id, tps, solution, tinue_length, tinue_avoidance_length,
tiltak_2komi_eval, tiltak_2komi_second_move_eval)`` (eval columns written
as 0.0 — they are external-engine filters in the reference data).

    python -m takzero_tpu.tools.make_puzzles --out puzzles.db --size 6 \
        --games 64 --budget 4096 --min-ply 14
"""

from __future__ import annotations

import argparse
import sqlite3

import numpy as np

import jax
import jax.numpy as jnp

from ..search import eval as ev
from ..search.agents import dummy_evaluator
from ..search.core import make_kernels
from ..search.tree import init_tree
from ..tak import action_to_ptn, engine, state_to_tps
from ..tak.oracle import Oracle
from ..train.data import _host_opening, stack_states


def candidate_positions(eng, games: int, min_ply: int, rng, need_caps: bool):
    """(state, game_id) candidates from random oracle games."""
    orc = Oracle(eng.n, eng.half_komi, eng.reversible_limit)
    out = []
    for g in range(games):
        state = _host_opening(eng, orc, rng)
        _, actions, _ = orc.random_playout(
            state, seed=int(rng.integers(1, 2**31)), max_plies=200
        )
        cur = state
        for a in actions:
            if int(cur.ply) >= min_ply:
                if not need_caps or (
                    (np.asarray(cur.tops) == 3).sum() >= 2
                ):
                    out.append((cur, g))
            cur = orc.step(cur, int(a))
    return out


def make_solver(eng, budget: int, max_children: int):
    """Build `solve(states) -> tree` ONCE per config: the exact solver
    (uniform-policy search).  Built per chunk, the fresh jit closure
    would retrace + recompile the whole budget-wide fori_loop program for
    every batch — compilation, not solving, would dominate the tool."""
    simulate, simulate_batch = make_kernels(
        eng, dummy_evaluator(eng), max_depth=24
    )
    k = 64

    @jax.jit
    def run(tree):
        tree = simulate(tree, jnp.zeros(tree.batch_size))
        def body(i, t):
            return simulate_batch(t, jnp.zeros(t.batch_size), k)
        return jax.lax.fori_loop(0, budget // k, body, tree)

    def solve(states):
        envs = jax.tree.map(jnp.asarray, stack_states(states))
        tree = init_tree(eng, envs, budget + 8, max_children)
        return run(tree)

    return solve


def extract_puzzles(eng, tree, tinue_depths, avoidance_depths):
    """[(lane, solution_action, tinue_len, avoidance_len)] from a solved batch."""
    n = eng.n
    root_flag = np.asarray(tree.root_flag)
    root_ply = np.asarray(tree.root_ply)
    ca = np.asarray(tree.child_action[:, 0, :])
    cf = np.asarray(tree.child_flag[:, 0, :])
    cp = np.asarray(tree.child_ply[:, 0, :])
    out = []
    for b in range(root_flag.shape[0]):
        valid = ca[b] >= 0
        if not valid.any():
            continue
        if root_flag[b] == ev.WIN and int(root_ply[b]) in tinue_depths:
            d = int(root_ply[b])
            sols = np.nonzero(valid & (cf[b] == ev.LOSS) & (cp[b] == d - 1))[0]
            if len(sols):
                out.append((b, int(ca[b][sols[0]]), d, None))
        elif root_flag[b] == ev.VALUE:
            losing = valid & (cf[b] == ev.WIN)
            survivors = np.nonzero(valid & ~losing)[0]
            if losing.sum() >= 1 and len(survivors) == 1:
                d = int(cp[b][losing].max()) + 1
                if d in avoidance_depths:
                    out.append((b, int(ca[b][survivors[0]]), None, d))
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="puzzles.db")
    parser.add_argument("--size", type=int, default=6)
    parser.add_argument("--half-komi", type=int, default=4)
    parser.add_argument("--games", type=int, default=64)
    parser.add_argument("--min-ply", type=int, default=14)
    parser.add_argument("--budget", type=int, default=4096)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--max-children", type=int, default=128)
    parser.add_argument("--tinue-depths", default="3,5,7,9")
    parser.add_argument("--avoidance-depths", default="2,4,6")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    eng = engine(args.size, half_komi=args.half_komi)
    rng = np.random.default_rng(args.seed)
    tinue_depths = {int(x) for x in args.tinue_depths.split(",")}
    avoidance_depths = {int(x) for x in args.avoidance_depths.split(",")}

    con = sqlite3.connect(args.out)
    con.execute("CREATE TABLE IF NOT EXISTS games (id INTEGER PRIMARY KEY, size INTEGER)")
    con.execute(
        """CREATE TABLE IF NOT EXISTS puzzles (
            game_id INTEGER, tps TEXT, solution TEXT,
            tinue_length INTEGER, tinue_avoidance_length INTEGER,
            tiltak_2komi_eval REAL, tiltak_2komi_second_move_eval REAL)"""
    )

    # Growing an existing DB: our fresh game ids restart at 0, so offset
    # them past whatever the games PRIMARY KEY already holds.
    game_base = con.execute(
        "SELECT COALESCE(MAX(id) + 1, 0) FROM games"
    ).fetchone()[0]

    cands = candidate_positions(
        eng, args.games, args.min_ply, rng, need_caps=args.size >= 5
    )
    rng.shuffle(cands)
    print(f"{len(cands)} candidate positions from {args.games} games")
    solve = make_solver(eng, args.budget, args.max_children)
    seen_games = set()
    found = 0
    for i in range(0, len(cands) - args.batch + 1, args.batch):
        chunk = cands[i : i + args.batch]
        tree = solve([s for s, _ in chunk])
        for lane, action, tl, al in extract_puzzles(
            eng, tree, tinue_depths, avoidance_depths
        ):
            state, game_id = chunk[lane]
            game_id += game_base
            if game_id not in seen_games:
                seen_games.add(game_id)
                con.execute(
                    "INSERT INTO games VALUES (?, ?)", (game_id, args.size)
                )
            con.execute(
                "INSERT INTO puzzles VALUES (?, ?, ?, ?, ?, 0.0, 0.0)",
                (
                    game_id,
                    state_to_tps(eng.n, state),
                    action_to_ptn(eng.n, action),
                    tl,
                    al,
                ),
            )
            found += 1
        con.commit()
        print(f"batch {i // args.batch}: {found} puzzles so far")
    con.close()
    print(f"wrote {found} puzzles -> {args.out}")


if __name__ == "__main__":
    main()
