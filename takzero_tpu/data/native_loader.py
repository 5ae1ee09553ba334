"""ctypes bindings for the native (C++) data loader.

The reference parses its wire formats in Rust (target.rs:56-143,
215-268); this binds the C++ equivalent (cpp/tak_io.cpp): batch target
parsing, replay explosion into per-ply positions, and single TPS/PTN
parses — all returning numpy arrays with zero per-line Python work.

``make_batch_native`` additionally performs fully-vectorized 8-fold
symmetry augmentation (states via square-permutation gathers, policies
via the action map) and returns a training ``Batch``.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

from ..tak.moves import action_space
from ..tak.state import TakState
from ..tak.symmetry import action_maps, square_maps

_LIB = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        so = pathlib.Path(__file__).parent.parent / "cpp" / "libtak_oracle.so"
        srcs = list(so.parent.glob("*.cpp")) + list(so.parent.glob("*.hpp"))
        if not so.exists() or any(
            so.stat().st_mtime < s.stat().st_mtime for s in srcs
        ):
            import subprocess

            subprocess.run(["make", "-C", str(so.parent)], check=True)
        lib = ctypes.CDLL(str(so))
        c_i, c_l, c_cp = ctypes.c_int, ctypes.c_long, ctypes.c_char_p
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.tak_state_size.restype = c_i
        lib.tak_parse_tps.restype = c_i
        lib.tak_parse_tps.argtypes = [c_i, c_cp, c_l, i64p]
        lib.tak_parse_ptn.restype = c_i
        lib.tak_parse_ptn.argtypes = [c_i, c_cp, c_l]
        lib.tak_parse_targets.restype = c_i
        lib.tak_parse_targets.argtypes = [
            c_i, c_cp, c_l, c_i, c_l, i64p, f32p, f32p, i32p, f32p, i64p, i32p,
        ]
        lib.tak_parse_replays.restype = c_i
        lib.tak_parse_replays.argtypes = [
            c_i, c_i, c_i, c_cp, c_l, c_l, i64p, i32p,
        ]
        _LIB = lib
    return _LIB


def state_size(n: int) -> int:
    return 3 * n * n + 7


def unpack_states(n: int, buf: np.ndarray) -> TakState:
    """int64[T, state_size] -> batched TakState (numpy leaves)."""
    s = n * n
    buf = buf.reshape(-1, state_size(n))
    owners = buf[:, s : 2 * s].astype(np.uint64)
    return TakState(
        height=buf[:, :s].astype(np.int32),
        owner_lo=(owners & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        owner_hi=(owners >> np.uint64(32)).astype(np.uint32),
        tops=buf[:, 2 * s : 3 * s].astype(np.int32),
        reserves=buf[:, 3 * s : 3 * s + 4].astype(np.int32).reshape(-1, 2, 2),
        to_move=buf[:, 3 * s + 4].astype(np.int32),
        ply=buf[:, 3 * s + 5].astype(np.int32),
        reversible=buf[:, 3 * s + 6].astype(np.int32),
    )


def parse_tps(n: int, tps: str) -> TakState:
    lib = _lib()
    buf = np.zeros(state_size(n), np.int64)
    raw = tps.encode()
    rc = lib.tak_parse_tps(
        n, raw, len(raw), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    if rc != 0:
        raise ValueError(f"bad TPS: {tps!r}")
    state = unpack_states(n, buf[None])
    import jax

    return jax.tree.map(lambda x: x[0], state)


def parse_ptn(n: int, ptn: str) -> int:
    raw = ptn.encode()
    a = _lib().tak_parse_ptn(n, raw, len(raw))
    if a < 0:
        raise ValueError(f"bad PTN move: {ptn!r}")
    return a


def parse_targets(
    n: int, text: str, max_targets: int | None = None, return_lines: bool = False
):
    """-> (states TakState[T], value[T], ube[T], actions, probs, offsets[T+1]
    [, line_numbers[T]]).

    Malformed lines are skipped, matching the learner's tolerance.
    """
    lib = _lib()
    raw = text.encode()
    if max_targets is None:
        max_targets = text.count("\n") + 1
    cap_policy = max(1, len(raw) // 4)  # every policy item is >= 4 bytes
    ss = state_size(n)
    states = np.zeros((max_targets, ss), np.int64)
    value = np.zeros(max_targets, np.float32)
    ube = np.zeros(max_targets, np.float32)
    actions = np.zeros(cap_policy, np.int32)
    probs = np.zeros(cap_policy, np.float32)
    offsets = np.zeros(max_targets + 1, np.int64)
    lines = np.zeros(max_targets, np.int32)
    t = lib.tak_parse_targets(
        n,
        raw,
        len(raw),
        max_targets,
        cap_policy,
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lines.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    end = int(offsets[t])
    out = (
        unpack_states(n, states[:t]),
        value[:t],
        ube[:t],
        actions[:end],
        probs[:end],
        offsets[: t + 1],
    )
    return out + (lines[:t],) if return_lines else out


def valid_target_lines(n: int, lines: list[str]) -> list[str]:
    """Filter to lines the native parser accepts (ingestion-time check)."""
    if not lines:
        return []
    text = "\n".join(line.rstrip("\n") for line in lines) + "\n"
    *_, idx = parse_targets(n, text, return_lines=True)
    return [lines[i] for i in idx]


def parse_replay_positions(
    n: int,
    half_komi: int,
    reversible_limit: int,
    text: str,
    cap_positions: int | None = None,
):
    """Explode replays into the position before every action.

    -> (states TakState[P], plies int32[P]) — the reanalyze ingestion path
    (reference reanalyze/src/main.rs:269-290) without per-position Python.
    """
    lib = _lib()
    raw = text.encode()
    if cap_positions is None:
        # Worst case ~ one position per 3 bytes of move text.
        cap_positions = max(16, len(raw) // 2)
    ss = state_size(n)
    states = np.zeros((cap_positions, ss), np.int64)
    plies = np.zeros(cap_positions, np.int32)
    p = lib.tak_parse_replays(
        n,
        half_komi,
        reversible_limit,
        raw,
        len(raw),
        cap_positions,
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        plies.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return unpack_states(n, states[:p]), plies[:p]


# ---------------------------------------------------------------------------
# Vectorized batch assembly (native parse + numpy augmentation)
# ---------------------------------------------------------------------------


def augment_states(n: int, states: TakState, syms: np.ndarray) -> TakState:
    """Apply per-row symmetries (vectorized transform_state_np)."""
    perm = square_maps(n)  # [8, S]
    inv = np.argsort(perm, axis=1)  # inverse permutations
    gather = inv[syms]  # [T, S]
    rows = np.arange(states.height.shape[0])[:, None]

    def move(x):
        return np.asarray(x)[rows, gather]

    return states._replace(
        height=move(states.height),
        owner_lo=move(states.owner_lo),
        owner_hi=move(states.owner_hi),
        tops=move(states.tops),
    )


def make_batch_native(
    eng, text: str, rng: np.random.Generator, augment=True,
    splits: int | None = None,
):
    """Parse target lines and build a training Batch, all vectorized.

    With ``splits=c`` the text holds ``c`` consecutive batches and every
    Batch leaf comes back with a leading ``[c, T//c, ...]`` chunk axis
    (the layout ``make_train_step_chunk`` consumes).  Assembling a whole
    chunk in ONE call matters on a remote accelerator: per-batch assembly
    costs several dispatches + transfers each (~0.5-0.8 ms apiece through
    the tunnel), which at --chunk-steps 50 used to add ~300 ms of pure
    dispatch latency per chunk.
    """
    import jax
    import jax.numpy as jnp

    from ..train.learner import Batch

    from ..ops.repr import batch_planes_fn, scatter_policy

    n = eng.n
    a = action_space(n).num_actions
    states, value, ube, actions, probs, offsets = parse_targets(n, text)
    t = value.shape[0]
    if t == 0:
        raise ValueError("no targets parsed")
    if splits is not None and t % splits:
        raise ValueError(f"{t} targets not divisible by splits={splits}")
    syms = rng.integers(0, 8, size=t).astype(np.int32) if augment else np.zeros(t, np.int32)
    states = augment_states(n, states, syms)
    amap = action_maps(n)  # [8, A]
    # Per-item target row + symmetry-mapped action.
    item_row = np.repeat(np.arange(t), np.diff(offsets)).astype(np.int32)
    mapped = amap[syms[item_row], actions].astype(np.int32)
    # Dense policy/mask are built ON DEVICE from the sparse triple (a few
    # KB shipped instead of ~6 MB of mostly-zero [B, A] arrays), and the
    # planes encoder is a cached jit (eager vmap = one tunnel round trip
    # per primitive).
    policy, mask = scatter_policy(t, a, item_row, mapped, probs)
    batched = jax.tree.map(jnp.asarray, states)
    planes = batch_planes_fn(eng)(batched)
    batch = Batch(
        planes=planes,
        policy=policy,
        mask=mask,
        value=jnp.asarray(value),
        ube=jnp.asarray(ube),
    )
    if splits is None:
        return batch
    return jax.tree.map(
        lambda x: x.reshape((splits, t // splits) + x.shape[1:]), batch
    )
