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

_STEP_RE = re.compile(r"model_(\d+)\.ckpt$")


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
    `steps_per_checkpoint` (learn/src/main.rs:44-45)."""
    wrote = []
    if step % steps_per_save == 0:
        wrote.append(save_checkpoint(directory, "model_latest.ckpt", bundle))
    if step % steps_per_checkpoint == 0:
        wrote.append(save_checkpoint(directory, f"model_{step:07d}.ckpt", bundle))
    return wrote


def load_checkpoint(path, template):
    """Load into the structure of `template` (shapes must match)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


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
    return serialization.from_state_dict(template, merged)


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
    """

    def __init__(self, directory, sharding=None):
        self._path = latest_path(directory)
        self._sig = None
        self._sharding = sharding  # e.g. replicated over a dp mesh

    def reload_if_changed(self, bundle, log=None):
        """Returns (bundle, reloaded: bool); keeps old weights on failure."""
        try:
            st = os.stat(self._path)
        except OSError:
            return bundle, False
        sig = (st.st_mtime_ns, st.st_size)
        if sig == self._sig:
            return bundle, False
        try:
            loaded = load_checkpoint(self._path, bundle)
            bundle = jax.device_put(loaded, self._sharding)
        except Exception as e:  # torn read: keep the old weights
            if log is not None:
                log.warning("cannot load model (%s), keeping current", e)
            return bundle, False
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
        if step % steps_per_save == 0:
            self.submit(directory, "model_latest.ckpt", bundle)
        if step % steps_per_checkpoint == 0:
            self.submit(directory, f"model_{step:07d}.ckpt", bundle)

    def drain(self):
        """Block until all queued saves hit disk; re-raise the first error."""
        with self._lock:
            while self._order or self._busy:
                self._lock.wait()
        self._raise_pending_errors()
