"""Golden tests for the NN input encoding.

Ports the reference's de-facto encoding spec (takzero/src/network/repr.rs:
260-409): starting position, a complicated 5x5 position, and a tall stack.
The 5x5 expectation is rebuilt by an independent pure-Python TPS walker so
the check does not share code with the engine's bitfield representation.
"""

import numpy as np

from takzero_tpu.ops.repr import input_channels, state_to_planes, stack_size
from takzero_tpu.tak import engine, tps_to_state
from takzero_tpu.tak.moves import DEFAULT_RESERVES


def planes(n, half_komi, tps=None):
    eng = engine(n, half_komi=half_komi)
    state = tps_to_state(n, tps) if tps else eng.initial()
    return np.asarray(state_to_planes(eng, state))


def expected_from_tps(n, half_komi, tps):
    """Independent encoder: walks the TPS text directly."""
    board_part, to_move_s, _ = tps.rsplit(" ", 2)
    me = int(to_move_s) - 1
    ss = stack_size(n)
    out = np.zeros((input_channels(n), n, n), np.float32)
    used = [0, 0]
    flats = [0, 0]
    rows = board_part.split("/")
    for i, row in enumerate(rows):
        r = n - 1 - i
        c = 0
        for token in row.split(","):
            if token.startswith("x"):
                c += int(token[1:] or 1)
                continue
            mod = token[-1] if token[-1] in "SC" else ""
            digits = token[:-1] if mod else token
            colors = [int(d) - 1 for d in digits]  # bottom to top
            for col in colors:
                used[col] += 1
            top_color = colors[-1]
            piece = {"": 0, "S": 1, "C": 2}[mod]
            if piece == 0:
                flats[top_color] += 1
            offset = 0 if top_color == me else ss
            out[offset + piece, r, c] = 1.0
            below = list(reversed(colors))[1:][: ss - 3]  # top-down, skip top
            for d, col in enumerate(below):
                off = 0 if col == me else ss
                out[off + 3 + d, r, c] = 1.0
            c += 1
    stones, caps = DEFAULT_RESERVES[n]
    mine_left = stones - used[me] + (1 if False else 0)
    opp_left = stones - used[1 - me]
    # Caps: subtract used caps.
    cap_used = [0, 0]
    for i, row in enumerate(rows):
        for token in row.split(","):
            if token.endswith("C"):
                cap_used[int(token[-2]) - 1] += 1
    mine_stones = stones - (used[me] - cap_used[me])
    opp_stones = stones - (used[1 - me] - cap_used[1 - me])
    out[2 * ss + 0] = mine_stones / stones
    out[2 * ss + 1] = (caps - cap_used[me]) / caps if caps else 0.0
    out[2 * ss + 2] = opp_stones / stones
    out[2 * ss + 3] = (caps - cap_used[1 - me]) / caps if caps else 0.0
    out[2 * ss + 4] = float(me == 1)
    fcd = flats[0] - flats[1] - half_komi / 2.0
    out[2 * ss + 5] = fcd / (n * n)
    return out


def test_starting_position():
    got = planes(3, 0)
    expected = np.zeros_like(got)
    expected[2 * 9 // 9 * 9 // 9] = 0  # noqa - readability below
    ss = stack_size(3)
    expected[2 * ss + 0] = 1.0  # my stones ratio
    expected[2 * ss + 2] = 1.0  # opp stones ratio
    assert got.shape == (input_channels(3), 3, 3)
    np.testing.assert_array_equal(got, expected)


def test_complicated_position():
    tps = "x2,1221,x,1S/2,2C,2,1,x/x,212,21C,2S,2/2211S,2,21,1,1/x2,221S,2,x 2 23"
    got = planes(5, 4, tps)
    expected = expected_from_tps(5, 4, tps)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-6)
    # Literal spot checks from the reference handmade tensor (repr.rs:311-351):
    ss = stack_size(5)
    assert got[2 * ss + 5, 0, 0] == np.float32(-3.0 / 25.0)  # fcd plane
    assert got[2 * ss + 0, 0, 0] == np.float32(5.0 / 21.0)  # my (black) stones
    assert got[2 * ss + 2, 0, 0] == np.float32(10.0 / 21.0)  # opp stones
    assert got[2 * ss + 4].all()  # black to move
    # my (black) caps: 2C at rank 4 col 1 -> row 3.
    assert got[2, 3, 1] == 1.0
    # opp (white) cap: 21C at rank 3 col 2 -> row 2.
    assert got[ss + 2, 2, 2] == 1.0
    # my flats: rank1 col3, rank2 col1, rank3 cols1,4, rank4 cols0,2.
    mine_flats = np.zeros((5, 5), np.float32)
    for r, c in [(0, 3), (1, 1), (2, 1), (2, 4), (3, 0), (3, 2)]:
        mine_flats[r, c] = 1.0
    np.testing.assert_array_equal(got[0], mine_flats)


def test_tall_stack():
    # TPS "x3/x,21212112212S,x/x3 1 12", komi -0.5 (reference repr.rs:363-409)
    got = planes(3, -1, "x3/x,21212112212S,x/x3 1 12")
    x, o = 1.0, 0.0
    expected = np.zeros_like(got)
    # White to move; stack top is a black wall at (r1, c1).
    # Mine (white) carry planes at depths 1,4,5 -> channels 3,6,7.
    for ch in (3, 6, 7):
        expected[ch, 1, 1] = x
    # Opp (black): wall top (channel 9+1), carries depth 2,3,6 -> 13,14,17.
    expected[10, 1, 1] = x
    for ch in (13, 14, 17):
        expected[ch, 1, 1] = x
    expected[18] = 5.0 / 10.0  # my stones
    expected[20] = 4.0 / 10.0  # opp stones
    expected[23] = 0.5 / 9.0  # fcd with komi -0.5
    np.testing.assert_allclose(got, expected, atol=1e-6)
