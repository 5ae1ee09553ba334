"""Tests for evaluation, puzzle, TEI, and analysis tooling (tiny configs)."""

import io
import sqlite3

import jax
import numpy as np
import pytest

from takzero_tpu.drivers.puzzle import (
    AVOIDANCE_SQL,
    TINUE_SQL,
    benchmark,
    fetch_puzzles,
)
from takzero_tpu.drivers.tei import TeiEngine
from takzero_tpu.evaluation import make_compete
from takzero_tpu.models.agent import make_net_evaluate, new_agent
from takzero_tpu.models.network import NetConfig
from takzero_tpu.search.gumbel import make_gumbel_search
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak import engine

TINY = dict(filters=16, blocks=2, hash_bits=12, rnd_filters=8, rnd_blocks=1)


def test_compete_produces_results():
    cfg = NetConfig(n=3, half_komi=0, novelty="none", **TINY)
    eng = engine(3)
    evaluator = make_net_evaluate(cfg, eng)
    compete = make_compete(eng, evaluator, 4, 16, max_children=48, max_depth=16)
    a = new_agent(cfg, seed=1)
    b = new_agent(cfg, seed=2)
    envs = make_new_opening(eng, random_steps=2)(jax.random.PRNGKey(0), 4)
    result = compete(a, b, envs, jax.random.PRNGKey(1), max_moves=30)
    assert result.wins + result.losses + result.draws == 4
    assert 0.0 <= result.win_rate() <= 1.0


def test_puzzle_benchmark_on_known_tinue(tmp_path):
    # Build a small sqlite DB with the reference schema and a known 3x3
    # win-in-1 position (white plays b3 to complete the b-file road).
    db = tmp_path / "puzzles.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE games (id INTEGER PRIMARY KEY, size INTEGER)")
    con.execute(
        """CREATE TABLE puzzles (
            game_id INTEGER, tps TEXT, solution TEXT,
            tinue_length INTEGER, tinue_avoidance_length INTEGER,
            tiltak_2komi_second_move_eval REAL, tiltak_2komi_eval REAL)"""
    )
    con.execute("INSERT INTO games VALUES (1, 3)")
    # Note: the reference filters require capstone markers in the TPS; our
    # SQL keeps them, so embed stacks named 1C/2C is impossible at 3x3 —
    # relax by querying with fetch + running benchmark() directly instead.
    con.execute(
        "INSERT INTO puzzles VALUES (1, ?, 'b3', 1, NULL, 0.0, 0.0)",
        ("2,x,1/x,1,2/x,1,2 1 4",),
    )
    con.commit()
    con.close()

    rows = sqlite3.connect(db).execute(
        "SELECT tps, solution FROM puzzles WHERE tinue_length = 1"
    ).fetchall()
    assert rows

    cfg = NetConfig(n=3, half_komi=0, novelty="none", **TINY)
    eng = engine(3)
    evaluator = make_net_evaluate(cfg, eng)
    bundle = new_agent(cfg, seed=0)

    import jax.numpy as jnp

    def search_step(envs, bundle, key):
        search = make_gumbel_search(
            eng, lambda e: evaluator(bundle, e), 4, 16, max_depth=16
        )
        tree = init_tree(eng, envs, 24, 48)
        tree, _ = search(tree, key, jnp.zeros(envs.ply.shape[0]))
        return tree

    res = benchmark(
        eng, jax.jit(search_step), bundle, rows, True, 3, jax.random.PRNGKey(0)
    )
    assert res.attempted == 1
    assert res.solved == 1
    assert res.proven == 1  # win-in-1 must be solver-proven with budget 16

    # Size-aware SQL: the capstone filter only applies to boards with
    # capstones (>= 5), so the 3x3 row is returned here...
    assert len(fetch_puzzles(db, TINUE_SQL, 3, 1)) == 1
    assert fetch_puzzles(db, AVOIDANCE_SQL, 3, 2) == []
    # ...but the reference's 6x6 query shape (with the filter) stays valid.
    assert fetch_puzzles(db, TINUE_SQL, 6, 3) == []


def test_tei_handshake_and_bestmove():
    out = io.StringIO()
    eng = TeiEngine("tiny3", None, out=out)
    assert eng.handle("tei")
    assert "teiok" in out.getvalue()
    assert eng.handle("isready")
    assert "readyok" in out.getvalue()
    assert eng.handle("teinewgame 3")
    assert eng.handle("position startpos moves a1 c3")
    assert eng.handle("go nodes 128 movetime 100000")
    text = out.getvalue()
    assert "bestmove " in text
    assert "info " in text and " pv " in text
    move = text.strip().splitlines()[-1].split()[-1]
    from takzero_tpu.tak import ptn_to_action

    ptn_to_action(3, move)  # parses
    assert not eng.handle("quit")


def test_analysis_root_table():
    import jax.numpy as jnp

    from takzero_tpu.drivers.analysis import print_root_table
    from takzero_tpu.search.core import make_simulate

    cfg = NetConfig(n=3, half_komi=0, novelty="none", **TINY)
    eng = engine(3)
    evaluator = make_net_evaluate(cfg, eng)
    bundle = new_agent(cfg, seed=0)
    simulate = make_simulate(eng, lambda e: evaluator(bundle, e), max_depth=16)

    @jax.jit
    def run(tree):
        return jax.lax.fori_loop(0, 24, lambda _, t: simulate(t, jnp.zeros(1)), tree)

    envs = jax.tree.map(lambda x: jnp.asarray(x)[None], eng.initial())
    tree = run(init_tree(eng, envs, 32, 48))
    buf = io.StringIO()
    print_root_table(3, tree, out=buf)
    text = buf.getvalue()
    assert "root: visits=" in text
    assert "a1" in text or "b2" in text


def test_compete_asymmetric_tree_reuse():
    """(white, black) reuse pair: carried-subtree vs fresh-tree at equal
    budget runs and scores all games (the reuse-strength A/B harness)."""
    cfg = NetConfig(n=3, half_komi=0, novelty="none", **TINY)
    eng = engine(3)
    evaluator = make_net_evaluate(cfg, eng)
    compete = make_compete(
        eng, evaluator, 4, 16, max_children=48, max_depth=16,
        tree_reuse=(True, False),
    )
    a = new_agent(cfg, seed=1)
    envs = make_new_opening(eng, random_steps=2)(jax.random.PRNGKey(2), 4)
    result = compete(a, a, envs, jax.random.PRNGKey(3), max_moves=30)
    assert result.wins + result.losses + result.draws == 4
