"""Multi-host helpers (single-process degenerate case)."""

import jax

from takzero_tpu.parallel.multihost import global_mesh, process_batch_slice


def test_process_batch_slice_single_process():
    per, off = process_batch_slice(64)
    assert per == 64 // jax.process_count()
    assert off == jax.process_index() * per


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp",)
