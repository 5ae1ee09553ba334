"""Device meshes and sharding placement helpers.

The reference scales by running many single-GPU actor processes plus one
learner (SURVEY.md §2.5).  The TPU-native equivalents:

* learner: data parallelism over the target batch under a ``dp`` mesh axis
  — parameters/optimizer state replicated, batch sharded on axis 0; GSPMD
  inserts the gradient all-reduce over ICI;
* actors: the env/tree batch is sharded over ``dp`` the same way (every
  array in Tree/TakState is batch-leading);
* novelty bitset: replicated with identical updates (the per-batch index
  set is all-gathered by GSPMD automatically since updates read the full
  batch).

``drivers/learn.py`` and ``drivers/selfplay.py`` expose this through
``--devices N``: they place inputs with these helpers and let the jitted
step propagate the shardings — no separate multi-device code path.
Single-process multi-host extension (jax.distributed, parallel/
multihost.py) keeps this layout; cross-job coordination stays on the
filesystem protocol (parallel/coordinator.py), mirroring the reference's
proven decoupling (README.md:128-135).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"--devices {n_devices} but only {len(devices)} visible"
            )
        if jax.process_count() > 1 and n_devices != len(devices):
            # A partial mesh would exclude some processes' devices: those
            # processes then have no local participants in the jitted
            # collectives and the group hangs or errors. Every process in
            # a multihost job must contribute all of its chips.
            raise ValueError(
                f"--devices {n_devices} != {len(devices)} global devices; "
                "in multihost mode the mesh must span every device "
                "(omit --devices or pass the global count)"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def driver_mesh(parser, n_devices: int, batch: int, log, what: str) -> Mesh:
    """Shared --devices plumbing for the driver CLIs: divisibility check,
    mesh construction, one log line."""
    if batch % n_devices:
        parser.error(f"{what} {batch} not divisible by --devices {n_devices}")
    mesh = make_mesh(n_devices)
    log.info("%s %d sharded over %d devices: %s", what, batch, n_devices, mesh)
    return mesh


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place(x, sharding: NamedSharding | None):
    """device_put in-process; callback assembly when the mesh spans
    processes (each process contributes only its addressable shards, so
    the same full host value must be present on every process — the
    multihost drivers guarantee that by broadcasting reads and seeds,
    parallel/multihost.py)."""
    if sharding is None or jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_batch(mesh: Mesh, batch, axis: str = "dp", batch_dim: int = 0):
    """Place a pytree with `batch_dim` sharded over the mesh.

    ``batch_dim=0`` for plain batches; the learner's chunked path stacks
    K batches to [K, B, ...] and shards ``batch_dim=1``.
    """

    def put(x):
        spec = [None] * x.ndim
        spec[batch_dim] = axis
        return place(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: place(x, rep), tree)
