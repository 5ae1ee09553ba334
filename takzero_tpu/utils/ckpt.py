"""Checkpointing with the reference's naming protocol.

Mirrors takzero's model files (SURVEY.md §5.4): a mutable
``model_latest.ckpt`` (every N steps) plus immutable ``model_{step:07}.ckpt``
checkpoints; resume picks the highest-numbered one (learn/src/main.rs:
107-120, 270-290).  Improvements over the reference: writes are atomic
(tmp + rename), so readers never see torn files, and hash-novelty state is
embedded in the checkpoint instead of a shared per-directory sidecar (the
reference's bitvec.bin collides between checkpoints).

Format: flax msgpack of the full bundle pytree.
"""

from __future__ import annotations

import os
import pathlib
import re
import tempfile

import jax
import numpy as np
from flax import serialization

def _place(x, sharding):
    """Cross-process-safe placement (parallel/mesh.py)."""
    from ..parallel.mesh import place

    return place(x, sharding)


_STEP_RE = re.compile(r"model_(\d+)\.ckpt$")

# Append-only log of novelty-hash bit indices (uint32 LE), written by the
# learner alongside a weights-only ``model_latest.ckpt``.  Replaying the
# log through ``bitset_set`` reconstructs the hash bitset exactly, so
# actors keep their ~512 MiB bitset device-resident and apply tiny deltas
# instead of re-shipping it on every model reload (the reference ships its
# ``bitvec.bin`` sidecar wholesale, selfplay/src/main.rs:107-120; immutable
# step checkpoints here still embed the full bitset, keeping resume and
# offline evaluation self-contained).
HASH_LOG = "hash_log.bin"


def strip_hash_bits(bundle):
    """Weights-only view of a bundle (drop the novelty bitset, if any)."""
    if isinstance(bundle, dict) and "hash_bits" in bundle:
        return {k: v for k, v in bundle.items() if k != "hash_bits"}
    return bundle


def fresh_indices(idx, fresh) -> np.ndarray:
    """Host-side compress of a (indices, fresh-mask) pair from
    ``models.agent.hash_indices_fresh``: keep only bits newly set by this
    batch, deduplicated.  Bounds ``hash_log.bin`` at the number of
    DISTINCT bits ever set — appending raw per-position indices would
    grow the log without bound (every forced reuse and cross-epoch
    repeat re-logs the same bit) until replaying it costs more than the
    wholesale bitset ship it replaces."""
    idx = np.asarray(idx).ravel()
    fresh = np.asarray(fresh).ravel()
    return np.unique(idx[fresh]).astype("<u4")


def append_hash_indices(directory, idx) -> None:
    """Append uint32 bit indices to the hash log (single atomic write)."""
    arr = np.ascontiguousarray(np.asarray(idx).ravel(), dtype="<u4")
    if arr.size == 0:
        return
    with open(pathlib.Path(directory) / HASH_LOG, "ab") as f:
        f.write(arr.tobytes())


def reconcile_hash_log(directory, bits_host: np.ndarray) -> int:
    """Append bits set in `bits_host` (uint32 words) but absent from the
    log; returns how many were appended.  Run once at learner resume —
    a crash window can leave the deferred log behind the checkpointed
    bitset, and actors would otherwise miss those bits forever."""
    path = pathlib.Path(directory) / HASH_LOG
    idx, _ = read_hash_indices(path, 0)
    have = np.zeros(bits_host.size, np.uint32)
    if idx.size:
        np.bitwise_or.at(
            have, (idx >> 5).astype(np.int64), np.uint32(1) << (idx & 31)
        )
    missing = np.asarray(bits_host, np.uint32) & ~have
    words = np.flatnonzero(missing)
    if words.size == 0:
        return 0
    out = []
    mw = missing[words]
    for b in range(32):
        hit = (mw >> np.uint32(b)) & np.uint32(1) != 0
        if hit.any():
            out.append((words[hit].astype(np.uint32) << 5) | np.uint32(b))
    all_missing = np.concatenate(out)
    append_hash_indices(directory, all_missing)
    return int(all_missing.size)


def read_hash_indices(path, offset: int):
    """(uint32 indices appended since `offset`, new offset)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return np.zeros((0,), np.uint32), offset
    size -= size % 4  # ignore a torn trailing write
    if size <= offset:
        return np.zeros((0,), np.uint32), offset
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(size - offset)
    return np.frombuffer(data, dtype="<u4"), size


def save_checkpoint(directory, name: str, bundle) -> pathlib.Path:
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    host = jax.tree.map(np.asarray, bundle)
    data = serialization.to_bytes(host)
    path = directory / name
    fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tmp_ckpt_")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def save_latest_and_step(directory, step: int, bundle, steps_per_save=100,
                         steps_per_checkpoint=50_000):
    """Reference cadence: latest every `steps_per_save`, immutable every
    `steps_per_checkpoint` (learn/src/main.rs:44-45).  Latest is
    weights-only per the hash-log protocol (HASH_LOG above); only the
    immutable step checkpoints embed the full novelty bitset."""
    wrote = []
    if step % steps_per_save == 0:
        wrote.append(
            save_checkpoint(
                directory, "model_latest.ckpt", strip_hash_bits(bundle)
            )
        )
    if step % steps_per_checkpoint == 0:
        wrote.append(save_checkpoint(directory, f"model_{step:07d}.ckpt", bundle))
    return wrote


def _to_device(bundle):
    """One upfront host->device transfer for a freshly loaded bundle.

    flax.serialization restores HOST numpy leaves; passing those into a
    jitted function re-uploads them on EVERY call.  Over the remote-TPU
    tunnel that cost r5's evaluation driver ~80 MB of weight re-upload
    per half-move and — during tunnel stalls — a 40-60 MB/s client-side
    buffer leak that OOM-killed the host five times in round 4 (dmesg;
    utils/watchdog.py).  selfplay avoided it because LatestPoller
    device_puts once; loading does the same now for every consumer
    (evaluation, puzzle, eee, tei, analysis, bench, reuse_ab).
    """
    try:
        return jax.device_put(bundle)
    except Exception:  # no usable backend: tools inspecting host-side
        return bundle


def load_checkpoint(path, template):
    """Load into the structure of `template` (shapes must match)."""
    with open(path, "rb") as f:
        data = f.read()
    return _to_device(serialization.from_bytes(template, data))


def load_checkpoint_partial(path, template):
    """Best-effort load: missing/mismatched leaves keep template values.

    The reference's `load_partial` (network/mod.rs:28-35) tolerates
    architecture-mismatched checkpoints during evaluation.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def merge(tmpl, loaded):
        if isinstance(tmpl, dict) and isinstance(loaded, dict):
            return {
                k: merge(tmpl[k], loaded[k]) if k in loaded else tmpl[k]
                for k in tmpl
            }
        if loaded is None:
            return tmpl
        arr = np.asarray(loaded)
        return arr if arr.shape == np.shape(tmpl) else tmpl

    state = serialization.to_state_dict(template)
    merged = merge(state, raw)
    return _to_device(serialization.from_state_dict(template, merged))


def resume_with_hash_log(directory, bundle, log, reconcile: bool):
    """Shared learner resume protocol (drivers/learn.py, drivers/
    coscheduled.py — two producers of the same files must not diverge):
    load the highest-step checkpoint into `bundle` and, with
    ``reconcile`` (hash-logged net AND this process owns file writes),
    re-append any bitset bits missing from ``hash_log.bin`` — a crash
    window can leave the deferred log behind the checkpointed bitset,
    and actors would otherwise miss those bits forever.

    Returns ``(bundle, steps)``; ``steps == 0`` means fresh init (the
    caller writes ``model_0000000.ckpt``)."""
    resume = model_path_with_most_steps(directory)
    if resume is None:
        return bundle, 0
    steps, path = resume
    log.info("resuming from %s at step %d", path, steps)
    bundle = load_checkpoint(path, bundle)
    if reconcile:
        missing = reconcile_hash_log(directory, np.asarray(bundle["hash_bits"]))
        if missing:
            log.info("hash log reconciled: %d bits re-appended", missing)
    return bundle, steps


def model_path_with_most_steps(directory):
    """(step, path) of the highest-numbered checkpoint, or None."""
    directory = pathlib.Path(directory)
    best = None
    if not directory.is_dir():
        return None
    for p in directory.iterdir():
        m = _STEP_RE.search(p.name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, p)
    return best


def latest_path(directory) -> pathlib.Path:
    return pathlib.Path(directory) / "model_latest.ckpt"


class LatestPoller:
    """Reload `model_latest.ckpt` only when the file actually changed.

    The reference actors poll for a NEW model (selfplay/src/main.rs:89-125),
    not reload every move — an unconditional reload re-reads and re-uploads
    the full bundle (hundreds of MB with an embedded novelty bitset) per
    move, which dwarfed the search itself over a remote-accelerator link.
    The loaded bundle is device_put once so subsequent jitted calls do not
    re-transfer host numpy weights.

    The novelty bitset never travels with ``model_latest``: the learner
    publishes weights-only latest checkpoints plus the ``hash_log.bin``
    delta stream, and the poller keeps the bitset device-resident,
    OR-ing in only the newly logged bit indices (idempotent, so replays
    and ahead-of-weights bits are harmless).
    """

    HASH_CHUNK = 1 << 16  # fixed shape: one jit trace regardless of delta size

    def __init__(self, directory, sharding=None):
        self._path = latest_path(directory)
        self._hash_path = pathlib.Path(directory) / HASH_LOG
        self._hash_off = 0
        self._sig = None
        self._sharding = sharding  # e.g. replicated over a dp mesh
        self._apply = None

    def _apply_hash_delta(self, bundle):
        # NOTE: bitset_set is jitted with donate_argnums=0 — the input
        # bundle's ``hash_bits`` buffer is CONSUMED (donated in place to
        # avoid a second ~512 MiB allocation per delta).  Callers of
        # reload_if_changed must treat the passed bundle as moved-from
        # and use only the returned one.
        if not (isinstance(bundle, dict) and "hash_bits" in bundle):
            return bundle, False
        idx, self._hash_off = read_hash_indices(self._hash_path, self._hash_off)
        if idx.size == 0:
            return bundle, False
        if self._apply is None:
            from ..ops.bitset import bitset_set

            self._apply = jax.jit(bitset_set, donate_argnums=0)
        bits = bundle["hash_bits"]
        for i in range(0, idx.size, self.HASH_CHUNK):
            chunk = idx[i : i + self.HASH_CHUNK]
            if chunk.size < self.HASH_CHUNK:  # pad with repeats (idempotent)
                chunk = np.concatenate(
                    [chunk, np.full(self.HASH_CHUNK - chunk.size, chunk[-1], "<u4")]
                )
            bits = self._apply(bits, _place(chunk, self._sharding))
        return {**bundle, "hash_bits": bits}, True

    def reload_if_changed(self, bundle, log=None):
        """Returns (bundle, reloaded: bool); keeps old weights on failure."""
        bundle, hash_changed = self._apply_hash_delta(bundle)
        try:
            st = os.stat(self._path)
        except OSError:
            return bundle, hash_changed
        sig = (st.st_mtime_ns, st.st_size)
        if sig == self._sig:
            return bundle, hash_changed
        try:
            # Partial load: a weights-only latest keeps the current
            # (device-resident) bitset leaf from the template.  Re-placing
            # that leaf would round-trip the ~512 MiB bitset through host
            # numpy on every reload in multihost mode (mesh.place fetches
            # with np.asarray) — exactly what the hash-log protocol
            # exists to avoid — so place only the loaded weights and
            # reattach the existing bitset array untouched.
            loaded = load_checkpoint_partial(self._path, bundle)
            keep_bits = None
            if (
                isinstance(loaded, dict)
                and "hash_bits" in loaded
                and loaded["hash_bits"] is bundle.get("hash_bits")
            ):
                # Identity with the template leaf means the file was
                # weights-only; a full-bundle latest (older writer) loads
                # a fresh host array and is placed like any other leaf.
                keep_bits = loaded["hash_bits"]
                loaded = strip_hash_bits(loaded)
            bundle = jax.tree.map(
                lambda x: _place(x, self._sharding), loaded
            )
            if keep_bits is not None:
                bundle = {**bundle, "hash_bits": keep_bits}
        except Exception as e:  # torn read: keep the old weights
            if log is not None:
                log.warning("cannot load model (%s), keeping current", e)
            return bundle, hash_changed
        self._sig = sig
        return bundle, True


class AsyncSaver:
    """Background checkpoint writer.

    `save_latest_and_step` fetches the full bundle from device and writes
    it synchronously — with the 512 MiB embedded novelty bitset that is
    seconds per save, paid every `steps_per_save` optimizer steps. This
    worker does the fetch + serialize + atomic write on a separate thread
    so the training loop keeps dispatching. jax device arrays are
    immutable, so snapshotting the pytree reference is race-free; writes
    to distinct names stay ordered by the single worker thread.

    Robustness: a failed write is logged immediately AND re-raised on the
    next submit/drain (a silent background failure would let a learner
    train for days publishing nothing). Re-submitting a name that is
    still queued REPLACES the pending snapshot (newest wins) — saves
    slower than the cadence coalesce on ``model_latest.ckpt`` instead of
    pinning an unbounded queue of ~600 MB bundles.
    """

    def __init__(self):
        import collections
        import logging
        import threading

        self._lock = threading.Condition()
        self._order: "collections.deque" = collections.deque()
        self._pending: dict = {}
        self._errors: list = []
        self._busy = False
        self._closed = False
        self._log = logging.getLogger("ckpt")
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            with self._lock:
                while not self._order and not self._closed:
                    self._lock.wait()
                if self._closed and not self._order:
                    return
                name = self._order.popleft()
                directory, bundle = self._pending.pop(name)
                self._busy = True
            try:
                save_checkpoint(directory, name, bundle)
            except Exception as e:  # logged now, re-raised at next submit
                self._log.error("async checkpoint save of %s failed: %s", name, e)
                with self._lock:
                    self._errors.append(e)
            finally:
                with self._lock:
                    self._busy = False
                    self._lock.notify_all()

    def _raise_pending_errors(self):
        with self._lock:
            if self._errors:
                err = self._errors[0]
                self._errors.clear()
                raise err

    def submit(self, directory, name: str, bundle):
        self._raise_pending_errors()
        with self._lock:
            if name not in self._pending:
                self._order.append(name)
            self._pending[name] = (directory, bundle)  # newest wins
            self._lock.notify_all()

    def submit_latest_and_step(self, directory, step: int, bundle,
                               steps_per_save=100, steps_per_checkpoint=50_000):
        """Weights-only latest + full-bundle immutable checkpoints, same
        protocol as save_latest_and_step."""
        if step % steps_per_save == 0:
            self.submit(directory, "model_latest.ckpt", strip_hash_bits(bundle))
        if step % steps_per_checkpoint == 0:
            self.submit(directory, f"model_{step:07d}.ckpt", bundle)

    def drain(self):
        """Block until all queued saves hit disk; re-raise the first error."""
        with self._lock:
            while self._order or self._busy:
                self._lock.wait()
        self._raise_pending_errors()
