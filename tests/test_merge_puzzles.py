"""tools/merge_puzzles: dedup + game-id remapping."""

import sqlite3

from takzero_tpu.tools.merge_puzzles import merge


def _mk(path, rows):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE games (id INTEGER PRIMARY KEY, size INTEGER)")
    con.execute(
        """CREATE TABLE puzzles (
            game_id INTEGER, tps TEXT, solution TEXT,
            tinue_length INTEGER, tinue_avoidance_length INTEGER,
            tiltak_2komi_eval REAL, tiltak_2komi_second_move_eval REAL)"""
    )
    for gid, tps, sol, tl, al in rows:
        con.execute(
            "INSERT OR IGNORE INTO games VALUES (?, 6)", (gid,)
        )
        con.execute(
            "INSERT INTO puzzles VALUES (?, ?, ?, ?, ?, 0.0, 0.0)",
            (gid, tps, sol, tl, al),
        )
    con.commit()
    con.close()


def test_merge_dedups_and_remaps(tmp_path):
    a = str(tmp_path / "a.db")
    b = str(tmp_path / "b.db")
    out = str(tmp_path / "out.db")
    _mk(a, [(0, "tps1", "a1", 3, None), (1, "tps2", "b1", None, 2)])
    _mk(b, [(0, "tps2", "b1", None, 2), (0, "tps3", "c1", 5, None)])
    r1 = merge(out, [a])
    assert r1["added"] == 2 and r1["counts"] == {"t3": 1, "a2": 1}
    r2 = merge(out, [b])
    assert r2["added"] == 1 and r2["skipped_dup"] == 1
    assert r2["counts"] == {"t3": 1, "t5": 1, "a2": 1}
    con = sqlite3.connect(out)
    # b's game 0 must not collide with a's games 0/1.
    gids = {g for (g,) in con.execute("SELECT DISTINCT game_id FROM puzzles")}
    assert len(gids) == 3
    # Every puzzle's game row exists (drivers/puzzle.py JOINs on it).
    orphans = con.execute(
        "SELECT COUNT(*) FROM puzzles LEFT JOIN games ON game_id = games.id"
        " WHERE games.id IS NULL"
    ).fetchone()[0]
    assert orphans == 0
