"""One-buffer host readbacks for the learner flush.

The learner's per-chunk flush used to issue one device->host fetch per
metric leaf plus two for the hash-log (indices, fresh) pair — ~6 blocking
round-trips over the remote-accelerator link at 27-900 ms RTT each
(CLAUDE.md remote-link rule; the selfplay drivers already pack their
per-move readback into one buffer for the same reason).  These helpers
pack everything the flush needs into ONE uint32 vector on device and
unpack it on host after a single ``np.asarray``.

Mirrors no reference component directly: the reference learner logs
metrics from host-resident tensors (learn/src/main.rs:406-412); the cost
being amortized here is purely the remote-link round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_flush(metrics: dict, idx=None, fresh=None) -> jnp.ndarray:
    """Bitcast-and-concatenate a metrics dict (float32 leaves, any shape)
    plus an optional hash-index pair into one uint32 vector.

    Layout: [metrics in sorted-key order, flattened] ++ [idx] ++ [fresh].
    Jit-friendly (pure); retraces per distinct leaf shape, same as the
    chunked train step itself.
    """
    parts = [
        jax.lax.bitcast_convert_type(
            jnp.asarray(metrics[k], jnp.float32).reshape(-1), jnp.uint32
        )
        for k in sorted(metrics)
    ]
    if idx is not None:
        parts.append(idx.reshape(-1).astype(jnp.uint32))
        parts.append(fresh.reshape(-1).astype(jnp.uint32))
    return jnp.concatenate(parts)


def unpack_flush(buf: np.ndarray, keys, c: int, has_idx: bool):
    """Inverse of ``pack_flush`` on the host.

    Returns ``(metrics, new_indices)``: metrics maps each key to a
    float32[c] array; ``new_indices`` is the deduplicated uint32 array of
    indices whose fresh bit was set (ready for
    ``ckpt.append_hash_indices``), or None when ``has_idx`` is false.
    """
    buf = np.asarray(buf)
    keys = sorted(keys)
    nk = len(keys)
    mf = buf[: nk * c].view(np.float32)
    metrics = {k: mf[i * c : (i + 1) * c] for i, k in enumerate(keys)}
    new_idx = None
    if has_idx:
        rest = buf[nk * c :]
        half = rest.shape[0] // 2
        idx, fresh = rest[:half], rest[half:].astype(bool)
        new_idx = np.unique(idx[fresh]).astype("<u4")
    return metrics, new_idx


def drain_index_pairs(pairs, group: int = 64) -> np.ndarray:
    """Fetch a list of device ``(idx, fresh)`` pairs in grouped single
    transfers and return the deduplicated fresh indices.

    One ``jnp.stack`` dispatch + one fetch per ``group`` pairs instead of
    two blocking fetches per pair (a 100-step save window used to cost
    ~200 round-trips).  Pair shapes must match within the list (they do:
    every train batch has the same size).
    """
    out = []
    for i in range(0, len(pairs), group):
        chunk = pairs[i : i + group]
        stacked = np.asarray(
            jnp.stack(
                [
                    jnp.stack(
                        (p[0].reshape(-1).astype(jnp.uint32),
                         p[1].reshape(-1).astype(jnp.uint32))
                    )
                    for p in chunk
                ]
            )
        )
        idx = stacked[:, 0].ravel()
        fresh = stacked[:, 1].ravel().astype(bool)
        out.append(idx[fresh])
    if not out:
        return np.zeros((0,), "<u4")
    return np.unique(np.concatenate(out)).astype("<u4")
