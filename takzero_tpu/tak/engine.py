"""Vectorized, jit-compatible Tak rules engine.

Implements the behavior of the reference's external rules crate (fast-tak;
see SURVEY.md §0, §2.4) as pure JAX functions over :class:`TakState`:
legal-move masks directly in the policy-tensor action layout
(reference: takzero/src/network/repr.rs:49-116), `step`, and terminal
detection (roads via batched flood fill, flat counts with half-komi).

Rules implemented (standard Tak):
* swap opening: plies 0 and 1 place an *opponent* flat on any empty square;
* placements: flat/wall from stone reserve, cap from cap reserve;
* spreads: carry up to min(N, height) pieces from a controlled stack, drop
  >= 1 per square along a straight line; walls and caps block, except a lone
  capstone may flatten a wall on its final drop;
* wins: road (orthogonally connected flats/caps linking opposite edges; the
  player who just moved wins a double road), else when the board is full or
  a player's reserves are empty, flat count with komi (black gets
  half_komi/2 flats); equal counts draw;
* a no-progress draw after `reversible_limit` consecutive non-crushing
  spreads (fast-tak tracks `reversible_plies`; exact threshold is internal
  to that crate — configurable here, default 50).

All functions are single-state; use `jax.vmap` for batches.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import bits
from .moves import DEFAULT_RESERVES, DIR_DELTAS, action_space
from .state import TakState, initial_state

_U32 = jnp.uint32


@dataclass(frozen=True)
class TakEngine:
    n: int
    half_komi: int = 0
    reversible_limit: int = 50

    # ------------------------------------------------------------------
    # Derived constants
    # ------------------------------------------------------------------
    @property
    def space(self):
        return action_space(self.n)

    @property
    def num_actions(self) -> int:
        return self.space.num_actions

    @property
    def _tables(self):
        """jnp views of the static spread tables.

        Not cached: arrays must be materialized inside each trace, otherwise
        a first use under jit would cache tracers (leak).
        """
        sp = self.space
        return {
            "dir": jnp.asarray(sp.spread_dir),
            "k": jnp.asarray(sp.spread_k),
            "carry": jnp.asarray(sp.spread_carry),
            "drops": jnp.asarray(sp.spread_drops),
            "pre": jnp.asarray(sp.spread_pre),
        }

    def initial(self) -> TakState:
        return initial_state(self.n)

    # Jitted single-state entry points (handy for hosts/tests; batch code
    # jits its own fused loops instead).
    @functools.cached_property
    def step_jit(self):
        return jax.jit(self.step)

    @functools.cached_property
    def legal_mask_jit(self):
        return jax.jit(self.legal_mask)

    @functools.cached_property
    def game_result_jit(self):
        return jax.jit(self.game_result)

    @functools.cached_property
    def terminal_kind_jit(self):
        return jax.jit(self.terminal_kind)

    # ------------------------------------------------------------------
    # Derived boards
    # ------------------------------------------------------------------
    def top_color(self, state: TakState) -> jnp.ndarray:
        """Color of the top piece per square (int32; 0 where empty)."""
        h = jnp.maximum(state.height - 1, 0)
        return bits.get_bit(state.owner_lo, state.owner_hi, h).astype(jnp.int32)

    def _shifted_tops(self, state: TakState) -> jnp.ndarray:
        """tops at (sq + i*delta) for dir d, offset i: int32[4, n-1, S]; -1 OOB."""
        n = self.n
        tops2d = state.tops.reshape(n, n)
        rows = np.arange(n)[:, None] + np.zeros((1, n), np.int32)
        cols = np.arange(n)[None, :] + np.zeros((n, 1), np.int32)
        out = []
        for d in range(4):
            dr, dc = int(DIR_DELTAS[d, 0]), int(DIR_DELTAS[d, 1])
            per_dir = []
            for i in range(1, n):
                r, c = rows + i * dr, cols + i * dc
                valid = (0 <= r) & (r < n) & (0 <= c) & (c < n)
                gathered = tops2d[np.clip(r, 0, n - 1), np.clip(c, 0, n - 1)]
                per_dir.append(jnp.where(valid, gathered, -1).reshape(-1))
            out.append(jnp.stack(per_dir))
        return jnp.stack(out)  # [4, n-1, S]

    # ------------------------------------------------------------------
    # Legal move mask
    # ------------------------------------------------------------------
    def legal_mask(self, state: TakState) -> jnp.ndarray:
        """bool[num_actions] in the policy-tensor layout."""
        n, sp = self.n, self.space
        me = state.to_move
        swap = state.ply < 2
        empty = state.tops == 0
        stones_me = state.reserves[me, 0] > 0
        caps_me = state.reserves[me, 1] > 0

        place_flat = empty & (swap | stones_me)
        place_wall = empty & ~swap & stones_me
        place_cap = empty & ~swap & caps_me

        tc = self.top_color(state)
        control = (state.tops > 0) & (tc == me) & ~swap
        shifted = self._shifted_tops(state)  # [4, n-1, S]
        passable = (shifted == 0) | (shifted == 1)  # flat or empty, in bounds
        wall_at = shifted == 2
        is_cap = state.tops == 3

        tbl = self._tables
        p = sp.num_patterns
        spread_rows = []
        for d in range(4):
            k_d = tbl["k"][d * p : (d + 1) * p]  # [P]
            carry_d = tbl["carry"][d * p : (d + 1) * p]
            last_d = jnp.take_along_axis(
                tbl["drops"][d * p : (d + 1) * p], (k_d - 1)[:, None], axis=1
            )[:, 0]
            # intermediate squares 1..k-1 must be passable
            offs = jnp.arange(1, n)[None, :]  # [1, n-1]
            needed = offs < k_d[:, None]  # [P, n-1]
            inter_ok = jnp.all(passable[d][None] | ~needed[:, :, None], axis=1)  # [P, S]
            # final square (offset k)
            final_tops = shifted[d][k_d - 1]  # [P, S]
            final_ok = (final_tops == 0) | (final_tops == 1)
            crush_ok = (final_tops == 2) & (last_d[:, None] == 1) & is_cap[None, :]
            carry_ok = carry_d[:, None] <= jnp.minimum(n, state.height)[None, :]
            spread_rows.append(
                control[None, :] & carry_ok & inter_ok & (final_ok | crush_ok)
            )

        return jnp.concatenate(
            [place_flat[None], place_wall[None], place_cap[None]] + spread_rows, axis=0
        ).reshape(-1)

    # ------------------------------------------------------------------
    # Step
    # ------------------------------------------------------------------
    def step(self, state: TakState, action: jnp.ndarray) -> TakState:
        """Apply an action index (assumed legal). Returns the next state."""
        n = self.n
        s = n * n
        ch, sq = jnp.divmod(jnp.asarray(action, jnp.int32), s)
        is_place = ch < 3

        placed = self._place(state, ch, sq)
        spread = self._spread(state, ch - 3, sq)
        nxt = jax.tree.map(
            lambda a, b: jnp.where(is_place, a, b), placed, spread
        )
        return nxt._replace(
            to_move=1 - state.to_move,
            ply=state.ply + 1,
        )

    def _place(self, state: TakState, ch, sq) -> TakState:
        swap = state.ply < 2
        color = jnp.where(swap, 1 - state.to_move, state.to_move)
        piece = ch + 1  # 1 flat, 2 wall, 3 cap
        kind = jnp.where(piece == 3, 1, 0)  # reserve column
        lo = state.owner_lo.at[sq].set(
            state.owner_lo[sq] | color.astype(_U32)
        )
        return state._replace(
            height=state.height.at[sq].set(1),
            owner_lo=lo,
            tops=state.tops.at[sq].set(piece),
            reserves=state.reserves.at[color, kind].add(-1),
            reversible=jnp.int32(0),
        )

    def _spread(self, state: TakState, si, sq) -> TakState:
        n = self.n
        tbl = self._tables
        si = jnp.clip(si, 0, 4 * self.space.num_patterns - 1)
        d = tbl["dir"][si]
        k = tbl["k"][si]
        carry = tbl["carry"][si]
        delta = jnp.asarray(DIR_DELTAS)[d]  # (dr, dc)
        flat_delta = delta[0] * n + delta[1]

        h = state.height[sq]
        start = h - carry
        carried = bits.extract_bits(
            state.owner_lo[sq], state.owner_hi[sq], start, (_U32(1) << carry.astype(_U32)) - 1
        )
        keep_lo, keep_hi = bits.low_mask64(start)
        moving_top = state.tops[sq]

        height = state.height.at[sq].set(start)
        owner_lo = state.owner_lo.at[sq].set(state.owner_lo[sq] & keep_lo)
        owner_hi = state.owner_hi.at[sq].set(state.owner_hi[sq] & keep_hi)
        tops = state.tops.at[sq].set(jnp.where(start > 0, 1, 0))

        crushed = jnp.bool_(False)
        for i in range(1, n):  # static unroll; masked beyond k
            active = i <= k
            tsq = jnp.clip(sq + i * flat_delta, 0, n * n - 1)
            di = tbl["drops"][si, i - 1]
            pre = tbl["pre"][si, i - 1]
            chunk = (carried >> pre.astype(_U32)) & ((_U32(1) << di.astype(_U32)) - 1)
            ht = height[tsq]
            new_lo, new_hi = bits.insert_bits(owner_lo[tsq], owner_hi[tsq], chunk, ht)
            is_final = i == k
            crushed = crushed | (active & is_final & (tops[tsq] == 2))
            new_top = jnp.where(is_final, moving_top, 1)
            height = height.at[tsq].set(jnp.where(active, ht + di, ht))
            owner_lo = owner_lo.at[tsq].set(jnp.where(active, new_lo, owner_lo[tsq]))
            owner_hi = owner_hi.at[tsq].set(jnp.where(active, new_hi, owner_hi[tsq]))
            tops = tops.at[tsq].set(jnp.where(active, new_top, tops[tsq]))

        return state._replace(
            height=height,
            owner_lo=owner_lo,
            owner_hi=owner_hi,
            tops=tops,
            reversible=jnp.where(crushed, 0, state.reversible + 1),
        )

    # ------------------------------------------------------------------
    # Terminal detection
    # ------------------------------------------------------------------
    def _roads(self, state: TakState) -> jnp.ndarray:
        """bool[2]: does (white, black) have a completed road."""
        n = self.n
        tc = self.top_color(state)
        road_piece = (state.tops == 1) | (state.tops == 3)
        cells = jnp.stack(
            [road_piece & (tc == 0), road_piece & (tc == 1)]
        ).reshape(2, n, n)
        # Four floods: (white horiz, white vert, black horiz, black vert).
        cells4 = cells[jnp.asarray([0, 0, 1, 1])]
        col = jnp.arange(n)
        seed_h = (col[None, :] == 0) & jnp.ones((n, 1), bool)
        seed_v = (col[:, None] == 0) & jnp.ones((1, n), bool)
        seeds = jnp.stack([seed_h, seed_v, seed_h, seed_v]) & cells4

        def dilate(x):
            up = jnp.pad(x[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
            down = jnp.pad(x[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
            left = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
            right = jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
            return x | up | down | left | right

        def body(_, reach):
            return cells4 & dilate(reach)

        reach = jax.lax.fori_loop(0, n * n, body, seeds)
        done_h = reach[:, :, n - 1].any(axis=1)  # reached east column
        done_v = reach[:, n - 1, :].any(axis=1)  # reached north row
        finished = jnp.stack([done_h[0], done_v[1], done_h[2], done_v[3]])
        return jnp.stack([finished[0] | finished[1], finished[2] | finished[3]])

    def game_result(self, state: TakState) -> jnp.ndarray:
        """int32: -1 ongoing, 0 white wins, 1 black wins, 2 draw."""
        roads = self._roads(state)
        both = roads[0] & roads[1]
        last_mover = 1 - state.to_move
        road_winner = jnp.where(both, last_mover, jnp.where(roads[0], 0, 1))
        any_road = roads[0] | roads[1]

        board_full = jnp.all(state.tops != 0)
        out_of_pieces = jnp.any(jnp.sum(state.reserves, axis=1) == 0)
        flats_end = board_full | out_of_pieces
        tc = self.top_color(state)
        wf = jnp.sum((state.tops == 1) & (tc == 0))
        bf = jnp.sum((state.tops == 1) & (tc == 1))
        w2, b2 = 2 * wf, 2 * bf + self.half_komi
        flat_winner = jnp.where(w2 > b2, 0, jnp.where(b2 > w2, 1, 2))

        no_progress = state.reversible >= self.reversible_limit

        return jnp.where(
            any_road,
            road_winner,
            jnp.where(flats_end, flat_winner, jnp.where(no_progress, 2, -1)),
        ).astype(jnp.int32)

    def terminal_kind(self, state: TakState) -> jnp.ndarray:
        """int32: 0 ongoing, 1 win (for to_move), 2 loss, 3 draw.

        Matches the reference's Terminal relative to the side to move
        (takzero/src/search/env.rs:47-59).
        """
        r = self.game_result(state)
        return jnp.where(
            r == -1,
            0,
            jnp.where(r == 2, 3, jnp.where(r == state.to_move, 1, 2)),
        ).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Extras
    # ------------------------------------------------------------------
    def flat_diff(self, state: TakState) -> jnp.ndarray:
        """white_flats - black_flats (white perspective, komi excluded)."""
        tc = self.top_color(state)
        wf = jnp.sum((state.tops == 1) & (tc == 0))
        bf = jnp.sum((state.tops == 1) & (tc == 1))
        return (wf - bf).astype(jnp.int32)

    def __hash__(self) -> int:
        return hash((self.n, self.half_komi, self.reversible_limit))


@functools.lru_cache(maxsize=None)
def engine(n: int, half_komi: int = 0, reversible_limit: int = 50) -> TakEngine:
    assert n in DEFAULT_RESERVES, f"unsupported board size {n}"
    return TakEngine(n=n, half_komi=half_komi, reversible_limit=reversible_limit)
