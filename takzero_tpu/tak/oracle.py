"""ctypes bindings for the C++ Tak rules oracle (bit-exactness testing).

The oracle is an independent implementation of the rules (explicit stacks,
recursive road search) used to fuzz the JAX engine — see BASELINE.md
("bit-exact Tak transitions").  Builds on demand via make.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

from .moves import action_space
from .state import TakState

_CPP_DIR = pathlib.Path(__file__).resolve().parent.parent / "cpp"


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    so = _CPP_DIR / "libtak_oracle.so"
    # Stale against ANY C++ source (the rules live in tak_core.hpp, not
    # just the .cpp) — otherwise a header edit silently fuzzes the JAX
    # engine against the previously compiled rules.
    srcs = list(_CPP_DIR.glob("*.cpp")) + list(_CPP_DIR.glob("*.hpp"))
    if not so.exists() or any(
        so.stat().st_mtime < s.stat().st_mtime for s in srcs
    ):
        subprocess.run(["make", "-C", str(_CPP_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.tak_num_actions.restype = ctypes.c_int
    lib.tak_result.restype = ctypes.c_int
    lib.tak_random_playout.restype = ctypes.c_int
    lib.tak_tinue_depth.restype = ctypes.c_int
    lib.tak_loses_within.restype = ctypes.c_int
    return lib


def _state_size(n: int) -> int:
    return 3 * n * n + 7


def pack_state(n: int, state: TakState) -> np.ndarray:
    s = n * n
    buf = np.zeros(_state_size(n), dtype=np.int64)
    buf[:s] = np.asarray(state.height)
    owners = np.asarray(state.owner_lo, np.uint64) | (
        np.asarray(state.owner_hi, np.uint64) << np.uint64(32)
    )
    buf[s : 2 * s] = owners.astype(np.int64)
    buf[2 * s : 3 * s] = np.asarray(state.tops)
    buf[3 * s : 3 * s + 4] = np.asarray(state.reserves).reshape(-1)
    buf[3 * s + 4] = int(state.to_move)
    buf[3 * s + 5] = int(state.ply)
    buf[3 * s + 6] = int(state.reversible)
    return buf


def unpack_state(n: int, buf: np.ndarray) -> TakState:
    s = n * n
    owners = buf[s : 2 * s].astype(np.uint64)
    return TakState(
        height=buf[:s].astype(np.int32),
        owner_lo=(owners & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        owner_hi=(owners >> np.uint64(32)).astype(np.uint32),
        tops=buf[2 * s : 3 * s].astype(np.int32),
        reserves=buf[3 * s : 3 * s + 4].astype(np.int32).reshape(2, 2),
        to_move=np.int32(buf[3 * s + 4]),
        ply=np.int32(buf[3 * s + 5]),
        reversible=np.int32(buf[3 * s + 6]),
    )


class Oracle:
    def __init__(self, n: int, half_komi: int = 0, reversible_limit: int = 50):
        self.n = n
        self.half_komi = half_komi
        self.reversible_limit = reversible_limit
        self.num_actions = action_space(n).num_actions
        self._lib = _lib()

    def _args(self):
        return (
            ctypes.c_int(self.n),
            ctypes.c_int(self.half_komi),
            ctypes.c_int(self.reversible_limit),
        )

    def legal_mask(self, state: TakState) -> np.ndarray:
        buf = pack_state(self.n, state)
        out = np.zeros(self.num_actions, dtype=np.uint8)
        self._lib.tak_legal_mask(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(bool)

    def step(self, state: TakState, action: int) -> TakState:
        buf = pack_state(self.n, state)
        self._lib.tak_step(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(int(action)),
        )
        return unpack_state(self.n, buf)

    def result(self, state: TakState) -> int:
        buf = pack_state(self.n, state)
        return self._lib.tak_result(
            *self._args(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        )

    def random_playout(
        self, state: TakState, seed: int, max_plies: int = 400
    ) -> tuple[TakState, list[int], int]:
        """Fast in-oracle random game; returns (final_state, actions, result)."""
        buf = pack_state(self.n, state)
        actions = np.zeros(max_plies, dtype=np.int32)
        res = ctypes.c_int(-1)
        plies = self._lib.tak_random_playout(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_uint64(seed),
            ctypes.c_int(max_plies),
            actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(res),
        )
        return unpack_state(self.n, buf), actions[:plies].tolist(), res.value

    def tinue_depth(
        self, state: TakState, max_depth: int, node_budget: int = 50_000_000
    ) -> int:
        """Minimal odd d <= max_depth such that the side to move forces a
        win (exact full-width search, cpp/tak_solver.cpp); 0 if none, -1
        if the node budget was exhausted (unknown)."""
        buf = pack_state(self.n, state)
        return self._lib.tak_tinue_depth(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(int(max_depth)),
            ctypes.c_int64(int(node_budget)),
        )

    def loses_within(
        self, state: TakState, depth: int, node_budget: int = 50_000_000
    ) -> int:
        """1 if the side to move is LOST within `depth` plies (every move
        leads to a forced opponent win), 0 if not, -1 if unknown."""
        buf = pack_state(self.n, state)
        return self._lib.tak_loses_within(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(int(depth)),
            ctypes.c_int64(int(node_budget)),
        )

    def avoidance_status(
        self, state: TakState, max_depth: int, node_budget: int = 50_000_000
    ) -> np.ndarray:
        """Per-action labels: -1 illegal, -2 survives, -3 unknown, k >= 0
        the opponent forces a win in minimally k plies after the move."""
        buf = pack_state(self.n, state)
        out = np.zeros(self.num_actions, dtype=np.int32)
        self._lib.tak_avoidance_status(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(int(max_depth)),
            ctypes.c_int64(int(node_budget)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out

    def avoidance_status_laddered(
        self,
        state: TakState,
        max_depth: int,
        small_budget: int,
        node_budget: int,
    ) -> np.ndarray:
        """`avoidance_status` with a budget ladder and two-survivor early
        exit: moves solve at `small_budget` first, unknowns retry at
        `node_budget`, and the search bails once two survivors are proven
        (remaining labels may be stale — check the survivor count FIRST)."""
        buf = pack_state(self.n, state)
        out = np.zeros(self.num_actions, dtype=np.int32)
        self._lib.tak_avoidance_status_laddered(
            *self._args(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(int(max_depth)),
            ctypes.c_int64(int(small_budget)),
            ctypes.c_int64(int(node_budget)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
