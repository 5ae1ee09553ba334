"""Tak engine unit tests.

Golden values cross-checked against the reference spec:
* possible-move counts (reference: takzero/src/network/repr.rs:16-34)
* the legal-move set of the golden policy-test position (repr.rs:411-499)
"""

import jax
import numpy as np
import pytest

from takzero_tpu.tak import (
    action_space,
    action_to_ptn,
    count_possible_moves,
    engine,
    ptn_to_action,
    state_to_tps,
    tps_to_state,
)
from takzero_tpu.tak.moves import decode_pattern, encode_pattern


@pytest.mark.parametrize(
    "n,expected",
    [(3, 126), (4, 480), (5, 1575), (6, 4572), (7, 12495), (8, 32704)],
)
def test_possible_move_counts(n, expected):
    assert count_possible_moves(n) == expected


def test_pattern_roundtrip():
    for n in (3, 6, 8):
        for mask in range(1, 2**n - 1):
            drops = decode_pattern(mask, n)
            assert all(d >= 1 for d in drops)
            assert encode_pattern(drops, n) == mask


def test_pattern_golden_n3():
    # Channel order from the reference golden policy test (repr.rs:423-485).
    expected = {1: [3], 2: [2], 3: [1, 2], 4: [1], 5: [2, 1], 6: [1, 1]}
    for mask, drops in expected.items():
        assert decode_pattern(mask, 3) == drops


def test_ptn_roundtrip():
    sp = action_space(5)
    for a in range(sp.num_actions):
        assert ptn_to_action(5, action_to_ptn(5, a)) == a


def play(eng, state, *moves):
    for m in moves:
        a = ptn_to_action(eng.n, m)
        legal = np.asarray(eng.legal_mask_jit(state))
        assert legal[a], f"{m} should be legal"
        state = eng.step_jit(state, a)
    return state


def test_opening_swap_rule():
    eng = engine(5)
    s0 = eng.initial()
    legal = np.asarray(eng.legal_mask_jit(s0))
    # Only flat placements on the first ply, one per square.
    assert legal.sum() == 25
    assert legal[: 25].all()

    s1 = eng.step_jit(s0, ptn_to_action(5, "a1"))
    # The placed stone belongs to black (swap rule).
    assert int(s1.tops[0]) == 1
    assert int(eng.top_color(s1)[0]) == 1
    assert int(s1.reserves[1, 0]) == 20  # black stones decremented
    assert int(s1.reserves[0, 0]) == 21

    s2 = eng.step_jit(s1, ptn_to_action(5, "e5"))
    assert int(eng.top_color(s2)[24]) == 0
    # Ply 2: walls/caps now allowed, spreads of own stones allowed.
    legal2 = np.asarray(eng.legal_mask_jit(s2))
    names = {action_to_ptn(5, a) for a in np.nonzero(legal2)[0]}
    assert "Sa2" in names and "Cb3" in names
    # White controls e5 (placed by black's swap ply), can spread it.
    assert "e5<" in names and "e5-" in names
    # Black's a1 stone is not white-controlled.
    assert "a1>" not in names


def test_spread_mechanics_and_stack():
    eng = engine(5)
    s = play(eng, eng.initial(), "a1", "e5", "b1", "d5", "b2", "d4")
    # White flat on b1 and b2; stack b2 onto b1? b2- : spread down.
    s = play(eng, s, "b2-")
    sq = 0 * 5 + 1  # b1
    assert int(s.height[sq]) == 2
    assert int(s.tops[sq]) == 1
    # Stack colors: bottom white (b1), top white (from b2).
    assert int(s.owner_lo[sq]) == 0b00
    tps = state_to_tps(5, s)
    assert tps.split(" ")[0].split("/")[-1].split(",")[1] == "11"


def test_tps_roundtrip_reference_position():
    tps = "x2,1221,x,1S/2,2C,2,1,x/x,212,21C,2S,2/2211S,2,21,1,1/x2,221S,2,x 2 23"
    state = tps_to_state(5, tps)
    assert state_to_tps(5, state) == tps
    eng = engine(5, half_komi=4)
    # From the reference repr test: flat diff is -1 (white 5, black 6).
    assert int(eng.flat_diff(state)) == -1
    assert int(eng.game_result(state)) == -1


def test_golden_position_legal_moves():
    # Reference golden policy test (repr.rs:411-499): all legal moves.
    tps = "2,1,x/1S,221,x/x,2S,2 1 6"
    state = tps_to_state(3, tps)
    eng = engine(3)
    legal = np.asarray(eng.legal_mask_jit(state))
    names = {action_to_ptn(3, a) for a in np.nonzero(legal)[0]}
    expected = {
        # flat placements on empties
        "a1", "c2", "c3",
        # wall placements
        "Sa1", "Sc2", "Sc3",
        # spreads (from the handmade policy tensor, repr.rs:436-485)
        "3b2+", "2b2+", "b2+", "a2+",
        "3b2>", "2b2>", "b2>", "a2>", "b3>",
        "a2-", "b3-",
        "b3<",
    }
    assert names == expected


def test_road_win_vertical():
    eng = engine(3)
    # White builds a road up the b-file; a3/c3 are the swap stones.
    s = play(eng, eng.initial(), "a3", "c3", "b1", "a1", "b2", "c2")
    assert int(eng.game_result_jit(s)) == -1
    s = play(eng, s, "b3")
    assert int(eng.game_result_jit(s)) == 0  # white road
    # Terminal relative to side to move (black): loss.
    assert int(eng.terminal_kind(s)) == 2


def test_road_needs_flats_not_walls():
    eng = engine(3)
    s = play(eng, eng.initial(), "a3", "c3", "b1", "a1", "b2", "c2", "Sb3")
    assert int(eng.game_result_jit(s)) == -1  # wall does not complete a road


def test_flat_win_board_full():
    eng = engine(3, half_komi=0)
    moves = ["a1", "b1", "c1", "a2", "b2", "c2", "a3", "b3"]
    s = play(eng, engine(3).initial(), *moves)
    assert int(eng.game_result_jit(s)) == -1
    s = play(eng, s, "c3")
    # Board is full. Count: white placed c1,b2,a3,c3 (4 flats)... compute:
    # swap: a1->black, b1->white; then white: c1,b2,a3,c3; black: a2,c2,b3.
    # white flats = b1,c1,b2,a3,c3 = 5; black = a1,a2,c2,b3 = 4.
    assert int(eng.game_result_jit(s)) == 0


def test_flat_win_komi():
    eng = engine(3, half_komi=4)  # komi 2 favors black
    moves = ["a1", "b1", "c1", "a2", "b2", "c2", "a3", "b3", "c3"]
    s = play(eng, engine(3).initial(), *moves)
    # white 5 vs black 4 + komi 2 -> black wins
    assert int(eng.game_result_jit(s)) == 1


def test_flat_draw():
    eng = engine(3, half_komi=2)  # komi 1: white 5 vs black 4+1 -> draw
    moves = ["a1", "b1", "c1", "a2", "b2", "c2", "a3", "b3", "c3"]
    s = play(eng, engine(3).initial(), *moves)
    assert int(eng.game_result_jit(s)) == 2


def test_wall_blocks_and_cap_crush():
    eng = engine(5)
    s = play(eng, eng.initial(), "a1", "e5", "c3", "Sc4")
    # White stack on c3, black wall on c4: c3+ is illegal (wall blocks).
    legal = np.asarray(eng.legal_mask_jit(s))
    assert not legal[ptn_to_action(5, "c3+")]
    # White places a cap on b4, black plays elsewhere, cap crushes c4.
    s = play(eng, s, "Cb4", "e4")
    legal = np.asarray(eng.legal_mask_jit(s))
    assert legal[ptn_to_action(5, "b4>")]
    s = play(eng, s, "b4>")
    sq = 3 * 5 + 2  # c4
    assert int(s.tops[sq]) == 3  # cap on top
    assert int(s.height[sq]) == 2
    # Crushed wall (black) below the white cap.
    assert int(s.owner_lo[sq]) == 0b01
    # A capstone cannot crush with more than one piece dropped.
    # (b4> carried 1 piece - fine. Build a 2-stack with cap on top elsewhere.)


def test_cap_cannot_crush_with_stack():
    eng = engine(5)
    s = play(eng, eng.initial(), "a1", "e5", "c3", "Sc5", "Cc4", "a2")
    # Stack flat under cap: c3+ puts flat onto c4 - illegal, cap there.
    legal = np.asarray(eng.legal_mask_jit(s))
    assert not legal[ptn_to_action(5, "c3+")]
    # Move cap+flat? cap alone at c4 can crush c5.
    assert legal[ptn_to_action(5, "c4+")]
    # Pick up 1 from c4 (the cap) - crush ok. But spread "2c4+11" illegal
    # because only height-1 stack. Build: c3 into c4 first.
    s2 = play(eng, s, "b1", "b2")
    legal2 = np.asarray(eng.legal_mask_jit(s2))
    # Now white c3 flat,c4 cap. Can't stack c3 onto c4 (cap on top blocks).
    assert not legal2[ptn_to_action(5, "c3+")]


def test_carry_limit():
    eng = engine(3)
    # Build a tall white stack on a2 via TPS, check carry limit 3.
    state = tps_to_state(3, "x3/11111,x2/x3 1 10")
    legal = np.asarray(eng.legal_mask_jit(state))
    assert legal[ptn_to_action(3, "3a2+")]
    assert legal[ptn_to_action(3, "3a2>12")]
    assert legal[ptn_to_action(3, "3a2>21")]
    # The all-ones drop pattern is outside the action space (mask 2^n-1).
    with pytest.raises(ValueError):
        ptn_to_action(3, "3a2>111")
    names = {action_to_ptn(3, a) for a in np.nonzero(legal)[0]}
    assert not any(name.startswith("4") for name in names)


def test_reserves_exhaustion_ends_game():
    eng = engine(3)
    # White has 1 stone left; placing it ends the game by flat count.
    tps = "2,2,x/1,1,x/1,1,2 1 10"
    state = tps_to_state(3, tps)
    state = state._replace(
        reserves=np.array([[1, 0], [5, 0]], np.int32)
    )
    s = eng.step_jit(state, ptn_to_action(3, "c2"))
    assert int(s.reserves[0, 0]) == 0
    assert int(eng.game_result_jit(s)) == 0  # white 5 flats vs black 3


def test_no_progress_draw():
    eng = engine(3, reversible_limit=4)
    s = play(eng, eng.initial(), "a3", "c3", "b1", "b3")
    for mv in ["b1>", "b3>", "c1<", "c3<"]:
        assert int(eng.game_result_jit(s)) == -1
        s = play(eng, s, mv)
    assert int(eng.game_result_jit(s)) == 2


def test_vmapped_step_matches_single():
    eng = engine(4)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    states = [eng.initial() for _ in range(8)]
    for _ in range(12):
        actions = []
        for i, st in enumerate(states):
            legal = np.nonzero(np.asarray(eng.legal_mask_jit(st)))[0]
            actions.append(rng.choice(legal))
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        stepped = jax.vmap(eng.step)(batched, jnp.asarray(actions))
        states = [eng.step(st, a) for st, a in zip(states, actions)]
        for i, st in enumerate(states):
            got = jax.tree.map(lambda x: np.asarray(x)[i], stepped)
            for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(st)):
                assert np.array_equal(a, np.asarray(b))
