"""External-data rules cross-check against recorded fast-tak output.

VERDICT r4 weak #7 / next #9: the engine's bit-exact fuzz runs against a
same-author C++ oracle, so a shared misreading of the rules would be
invisible.  This test closes part of that hole with data the reference
system itself produced: ``/root/reference/runs/*.txt`` are root-children
tables dumped by the REAL takzero+fast-tak stack during its search
experiments — 1,024 5x5 positions, one line each, every line listing
``move:visits:value:uncertainty`` for EVERY legal move (the reference's
own ``python/analyze_search.py:99-101`` asserts all twenty files share
the same move sets, so the keys are position-determined — the full
fast-tak legal-move enumeration, not an algorithm-dependent sample).

We cannot reconstruct the full positions from move lists alone, but
three strong invariants are checkable and each catches real classes of
rules/notation divergence:

1. every recorded PTN token round-trips through our action space
   (naming + drop-pattern encoding parity with takparse);
2. placement consistency: flats and walls are placeable on exactly the
   same (empty) squares, and capstone placements cover either none or
   all of them (cap reserve empty or not);
3. every spread family — the set of drop patterns recorded for one
   (origin, direction) — must be EXACTLY reproduced by our vectorized
   engine on some constructed position (carry height 1..5, free run r,
   hard blocker vs crushable wall, cap on top or not), with one
   consistent (height, cap-top) explanation across all four directions
   of the origin.  This exercises the hairiest rules code (spread
   enumeration, carry limit, wall/cap blocking, capstone crush) against
   externally generated ground truth.

Fixture: tests/data/reference_run_puct.txt is a verbatim copy of
/root/reference/runs/puct.txt (data, not code); when the reference tree
is present we additionally assert the other 19 files agree with it.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from takzero_tpu.tak import engine, ptn_to_action, tps_to_state
from takzero_tpu.tak.moves import action_space

N = 5
FIXTURE = pathlib.Path(__file__).parent / "data" / "reference_run_puct.txt"
REFERENCE_RUNS = pathlib.Path("/root/reference/runs")


def parse_lines(path):
    out = []
    for line in path.read_text().splitlines():
        keys = [m.split(":")[0] for m in line.split(",") if m]
        assert keys, "empty line in fixture"
        out.append(keys)
    return out


@pytest.fixture(scope="module")
def lines():
    return parse_lines(FIXTURE)


def decompose(a: int):
    """action index -> ('place', kind, sq) | ('spread', sq, dir, mask)."""
    sp = action_space(N)
    ch, sq = divmod(a, sp.num_squares)
    if ch < 3:
        return ("place", ch, sq)
    si = ch - 3
    d, m = divmod(si, sp.num_patterns)
    return ("spread", sq, d, m + 1)


def test_fixture_matches_reference_tree():
    if not REFERENCE_RUNS.is_dir():
        pytest.skip("reference tree not present")
    ours = parse_lines(FIXTURE)
    for other in sorted(REFERENCE_RUNS.glob("*.txt")):
        theirs = parse_lines(other)
        assert [set(k) for k in ours] == [set(k) for k in theirs], other


def test_ptn_round_trip(lines):
    """Every fast-tak token maps into our action space and back."""
    from takzero_tpu.tak import action_to_ptn

    seen = {k for keys in lines for k in keys}
    assert len(seen) > 1000  # rich coverage: placements, spreads, crushes
    for k in seen:
        a = ptn_to_action(N, k)
        assert 0 <= a < action_space(N).num_actions
        assert action_to_ptn(N, a) == k


def test_placement_consistency(lines):
    for i, keys in enumerate(lines):
        flats, walls, caps = set(), set(), set()
        for k in keys:
            kind = decompose(ptn_to_action(N, k))
            if kind[0] == "place":
                (flats, walls, caps)[kind[1]].add(kind[2])
        assert flats == walls, f"line {i}: flat/wall placement sets differ"
        assert caps == set() or caps == flats, (
            f"line {i}: capstone placements are neither none nor all"
        )


# --- spread families vs the real engine on constructed positions --------


def build_tps(m: int, cap_top: bool, r: int, blocker: str | None) -> str:
    """Mover stack of height m at a1, r free squares above, then a blocker.

    Column a, direction ``+``: a1 holds the stack (opponent flats under a
    mover top), a2..a(1+r) empty, a(2+r) an opponent wall/cap when
    blocker is set.  Everything else empty; player 1 to move.
    """
    col_a = [""] * N
    col_a[0] = "2" * (m - 1) + "1" + ("C" if cap_top else "")
    if blocker is not None:
        assert r < N - 1
        col_a[r + 1] = {"wall": "2S", "cap": "2C"}[blocker]
    rows = []
    for rank in range(N - 1, -1, -1):
        row = [col_a[rank] if c == 0 and col_a[rank] else "x"
               for c in range(N)]
        rows.append(",".join(row))
    return "/".join(rows) + " 1 10"


@pytest.fixture(scope="module")
def family_table():
    """{frozenset(masks): [(m, cap_top, r, blocker), ...]} from the engine."""
    eng = engine(N)
    sp = action_space(N)
    origin = 0  # a1
    up = 0  # '+'
    table: dict[frozenset, list] = {}
    for m in range(1, 6):
        for cap_top in (False, True):
            for r in range(0, N):
                blockers = [None] if r >= N - 1 else ["wall", "cap", None]
                for blocker in blockers:
                    state = tps_to_state(N, build_tps(m, cap_top, r, blocker))
                    mask = np.asarray(eng.legal_mask_jit(state))
                    masks = frozenset(
                        d[3]
                        for a in np.nonzero(mask)[0]
                        if (d := decompose(int(a)))[0] == "spread"
                        and d[1] == origin and d[2] == up
                    )
                    # r free squares then *nothing* placed (blocker None,
                    # r < N-1) leaves MORE room than r: only record the
                    # exact-r geometries.
                    if blocker is None and r < N - 1:
                        continue
                    table.setdefault(masks, []).append(
                        (m, cap_top, r, blocker)
                    )
    return table


def room_of(sq: int, d: int) -> int:
    row, col = divmod(sq, N)
    return [N - 1 - row, N - 1 - col, row, col][d]


def crushes(masks: frozenset, r: int) -> bool:
    """Does any pattern in the family reach square r+1 (a wall crush)?"""
    sp = action_space(N)
    for m in masks:
        drops = sp.spread_drops[0 * sp.num_patterns + (m - 1)]
        k = int(np.count_nonzero(drops))
        if k > r:
            return True
    return False


def test_spread_families(lines, family_table):
    """Every recorded spread family is exactly an engine-legal family."""
    checked = 0
    for i, keys in enumerate(lines):
        families: dict[tuple, set] = {}
        for k in keys:
            d = decompose(ptn_to_action(N, k))
            if d[0] == "spread":
                families.setdefault((d[1], d[2]), set()).add(d[3])
        by_origin: dict[int, list[set]] = {}
        for (sq, dirn), masks in families.items():
            room = room_of(sq, dirn)
            cfgs = [
                cfg
                for cfg in family_table.get(frozenset(masks), [])
                if cfg[2] <= room and (cfg[2] < room or cfg[3] != "wall"
                                       or not crushes(frozenset(masks),
                                                      cfg[2]))
            ]
            assert cfgs, (
                f"line {i}: spread family at sq={sq} dir={dirn} "
                f"(room {room}) not reproducible by the engine: "
                f"{sorted(masks)}"
            )
            by_origin.setdefault(sq, []).append(
                {(m, c) for m, c, _, _ in cfgs}
            )
            checked += 1
        # One consistent (stack height, cap-on-top) must explain all
        # directions of each origin.
        for sq, explanations in by_origin.items():
            common = set.intersection(*explanations)
            assert common, (
                f"line {i}: no single (height, cap) explains all "
                f"directions at sq={sq}"
            )
    assert checked > 2000  # thousands of families actually verified
