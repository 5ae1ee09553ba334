"""Device meshes and sharded training/selfplay steps.

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

Single-process multi-host extension (jax.distributed) keeps this layout;
cross-job coordination stays on the filesystem protocol
(parallel/coordinator.py), mirroring the reference's proven decoupling.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a batch-leading pytree with axis 0 sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        batch,
    )


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def make_dp_train_step(cfg, mesh, tx, axis: str = "dp"):
    """Jitted data-parallel training step over the mesh.

    Parameters replicated, batch sharded; GSPMD handles the collectives.
    """
    from ..train.learner import make_train_step

    step = make_train_step(cfg, tx)

    def wrapped(bundle, opt_state, batch, train_ube):
        return step(bundle, opt_state, batch, train_ube)

    return jax.jit(wrapped, static_argnames=("train_ube",)), mesh
