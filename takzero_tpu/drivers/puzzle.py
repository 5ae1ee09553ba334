"""Puzzle benchmark driver.

Replaces puzzle/src/main.rs: benchmark a checkpoint on a SQLite puzzle
database of 6x6 tinue (win-in-N, depths 3/5/7/9) and tinue-avoidance
(depths 2/4/6) positions.  Metrics per category:

* solved: the search's best action equals the stored solution;
* proven: tinue — the root was solver-proven a win; avoidance — all
  children except one are proven wins (the tinue was refuted everywhere
  else).

Usage:
    python -m takzero_tpu.drivers.puzzle --model CKPT --puzzle-db DB
        [--net net6_simhash] [--sampled-actions 64] [--search-budget 768]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sqlite3

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NET_PRESETS
from ..models.agent import make_net_evaluate, new_agent
from ..parallel import mesh as pm
from ..search import eval as ev
from ..search.gumbel import make_gumbel_search
from ..search.policy import select_best_slot, slot_action
from ..search.tree import init_tree, truncation_stats
from ..tak import action_to_ptn, engine, ptn_to_action, tps_to_state
from ..train.data import stack_states
from ..utils import ckpt

log = logging.getLogger("puzzle")
BATCH_SIZE = 64
SEED = 12345

TINUE_SQL = """SELECT tps, solution FROM puzzles
JOIN games ON puzzles.game_id = games.id
WHERE games.size = :size
    AND instr(tps, "1C") > 0
    AND instr(tps, "2C") > 0
    AND puzzles.tinue_length = :depth
    AND puzzles.tinue_avoidance_length IS NULL
    AND puzzles.tiltak_2komi_second_move_eval < 0.6
ORDER BY puzzles.game_id ASC"""

AVOIDANCE_SQL = """SELECT tps, solution FROM puzzles
JOIN games ON puzzles.game_id = games.id
WHERE games.size = :size
    AND instr(tps, "1C") > 0
    AND instr(tps, "2C") > 0
    AND puzzles.tinue_avoidance_length = :depth
    AND puzzles.tinue_length IS NULL
    AND puzzles.tiltak_2komi_eval < 0.6
ORDER BY game_id ASC"""


@dataclasses.dataclass
class PuzzleResult:
    category: str
    attempted: int = 0
    solved: int = 0
    proven: int = 0
    # Child-truncation exposure: incomplete nodes suppress loss/draw
    # proofs (search/tree.py), which is exactly what the avoidance
    # "proven" metric leans on — report how often C actually bound.
    nodes: int = 0
    nodes_incomplete: int = 0

    def solve_rate(self) -> float:
        return self.solved / self.attempted if self.attempted else 0.0

    def prove_rate(self) -> float:
        return self.proven / self.attempted if self.attempted else 0.0


def fetch_puzzles(db_path, sql, size, depth):
    # The reference SQL requires both capstones placed (a 6x6-data filter,
    # puzzle/src/main.rs:132-166); boards without capstones skip it.
    if size < 5:
        sql = sql.replace('AND instr(tps, "1C") > 0\n', "").replace(
            'AND instr(tps, "2C") > 0\n', ""
        )
        sql = "\n".join(
            line for line in sql.splitlines() if "instr(tps" not in line
        )
    con = sqlite3.connect(db_path)
    try:
        rows = con.execute(sql, {"size": size, "depth": depth}).fetchall()
    finally:
        con.close()
    return [(tps, sol) for tps, sol in rows]


def benchmark(eng, search_jit, bundle, puzzles, win: bool, n: int, key,
              place=None):
    result = PuzzleResult(category="tinue" if win else "avoidance")
    for i in range(0, len(puzzles), BATCH_SIZE):
        chunk = puzzles[i : i + BATCH_SIZE]
        states = [tps_to_state(n, tps) for tps, _ in chunk]
        # Pad the batch to BATCH_SIZE with repeats (results are sliced).
        while len(states) < BATCH_SIZE:
            states.append(states[-1])
        envs = jax.tree.map(jnp.asarray, stack_states(states))
        if place is not None:
            envs = place(envs)
        key, k = jax.random.split(key)
        tree = search_jit(envs, bundle, k)
        best = np.asarray(slot_action(tree, select_best_slot(tree)))
        flags = np.asarray(tree.root_flag)
        ch_flags = np.asarray(tree.child_flag[:, 0, :])
        ch_valid = np.asarray(tree.child_action[:, 0, :] >= 0)
        root_complete = ~np.asarray(tree.node_incomplete[:, 0])
        trunc = np.asarray(truncation_stats(tree))[: len(chunk)]
        result.nodes += int(trunc[:, 0].sum())
        result.nodes_incomplete += int(trunc[:, 1].sum())

        for g, (tps, solution) in enumerate(chunk):
            result.attempted += 1
            try:
                sol_action = ptn_to_action(n, solution)
            except ValueError:
                continue
            if best[g] == sol_action:
                result.solved += 1
            if win:
                proven = flags[g] == ev.WIN
            else:
                # The reference stores ALL root children, so its
                # all-but-one check is exhaustive (puzzle/src/main.rs:
                # 238-259).  Here the root may truncate to C slots —
                # an avoidance proof is only sound when every legal
                # move was actually examined, so gate on completeness.
                wins = int(((ch_flags[g] == ev.WIN) & ch_valid[g]).sum())
                proven = bool(root_complete[g]) and (
                    wins == int(ch_valid[g].sum()) - 1
                )
            if proven:
                result.proven += 1
            log.debug(
                "tps: %s, selected: %s, solution: %s, solved: %s",
                tps, action_to_ptn(n, int(best[g])), solution,
                best[g] == sol_action,
            )
    log.info(
        "%s attempted=%d solved=%d proven=%d solve_rate=%.3f prove_rate=%.3f"
        " truncated_nodes=%d/%d (%.4f%%)",
        result.category, result.attempted, result.solved, result.proven,
        result.solve_rate(), result.prove_rate(),
        result.nodes_incomplete, result.nodes,
        100.0 * result.nodes_incomplete / max(result.nodes, 1),
    )
    return result


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--puzzle-db", required=True)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--sampled-actions", type=int, default=64)
    parser.add_argument("--search-budget", type=int, default=768)
    parser.add_argument(
        "--depths", default="3,5,7,9", help="tinue depths, comma-separated"
    )
    parser.add_argument("--avoidance-depths", default="2,4,6")
    parser.add_argument("--filters", type=int, default=None,
                        help="override the preset's core width (benchmark "
                        "checkpoints trained at other sizes)")
    parser.add_argument("--blocks", type=int, default=None)
    parser.add_argument("--hash-bits", type=int, default=None)
    parser.add_argument("--devices", type=int, default=None,
                        help="shard the puzzle batch over the first N "
                        "visible devices under a dp mesh, model replicated")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    net_cfg = NET_PRESETS[args.net]
    import dataclasses as _dc

    overrides = {
        k: v
        for k, v in (
            ("filters", args.filters),
            ("blocks", args.blocks),
            ("hash_bits", args.hash_bits),
        )
        if v is not None
    }
    if overrides:
        net_cfg = _dc.replace(net_cfg, **overrides)
    n = net_cfg.n
    eng = engine(n, half_komi=net_cfg.half_komi)
    bundle = ckpt.load_checkpoint_partial(args.model, new_agent(net_cfg, seed=0))
    place = None
    if args.devices:
        _mesh = pm.driver_mesh(parser, args.devices, BATCH_SIZE, log, "batch")
        bundle = pm.replicate(_mesh, bundle)
        place = lambda envs: pm.shard_batch(_mesh, envs)  # noqa: E731
    evaluator = make_net_evaluate(net_cfg, eng)

    def search_step(envs, bundle, key):
        search = make_gumbel_search(
            eng,
            lambda e: evaluator(bundle, e),
            args.sampled_actions,
            args.search_budget,
            max_depth=48,
        )
        b = envs.ply.shape[0]
        tree = init_tree(
            eng, envs, args.search_budget + 8, 256 if n >= 6 else 128
        )
        tree, _ = search(tree, key, jnp.zeros(b))
        return tree

    search_jit = jax.jit(search_step)
    key = jax.random.PRNGKey(SEED)

    results = []
    for depth in (int(d) for d in args.depths.split(",") if d):
        puzzles = fetch_puzzles(args.puzzle_db, TINUE_SQL, n, depth)
        log.info("tinue %d: %d puzzles", depth, len(puzzles))
        key, k = jax.random.split(key)
        results.append(
            benchmark(eng, search_jit, bundle, puzzles, True, n, k, place)
        )
    for depth in (int(d) for d in args.avoidance_depths.split(",") if d):
        puzzles = fetch_puzzles(args.puzzle_db, AVOIDANCE_SQL, n, depth)
        log.info("avoidance %d: %d puzzles", depth, len(puzzles))
        key, k = jax.random.split(key)
        results.append(
            benchmark(eng, search_jit, bundle, puzzles, False, n, k, place)
        )
    return results


if __name__ == "__main__":
    main()
