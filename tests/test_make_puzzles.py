"""Native puzzle-DB generator (tools/make_puzzles.py) at tiny scale."""

import sqlite3

import numpy as np
import pytest

from takzero_tpu.tak import engine, ptn_to_action, tps_to_state
from takzero_tpu.tak.oracle import Oracle


@pytest.mark.slow
def test_generate_and_validate_puzzles(tmp_path):
    from takzero_tpu.tools import make_puzzles as mp

    db = tmp_path / "p.db"
    mp.main(
        [
            "--out", str(db),
            "--size", "3",
            "--half-komi", "0",
            "--games", "10",
            "--min-ply", "4",
            "--budget", "256",
            "--batch", "16",
            "--max-children", "48",
            "--tinue-depths", "1,3",
            "--avoidance-depths", "2",
            "--seed", "5",
        ]
    )
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT tps, solution, tinue_length FROM puzzles WHERE tinue_length=1"
    ).fetchall()
    assert rows, "expected some win-in-1 puzzles from random 3x3 games"

    # Validate win-in-1 puzzles against the independent C++ oracle: playing
    # the solution must immediately end the game with a win for the mover.
    eng = engine(3, half_komi=0)
    orc = Oracle(3, 0, eng.reversible_limit)
    for tps, sol, _ in rows[:10]:
        state = tps_to_state(3, tps)
        mover = int(np.asarray(state.to_move))
        nxt = orc.step(state, ptn_to_action(3, sol))
        assert orc.result(nxt) == mover, (tps, sol)
