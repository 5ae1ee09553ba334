"""Multi-host helpers (single-process degenerate case)."""

import jax
import pytest

from takzero_tpu.parallel.multihost import global_mesh, process_batch_slice


def test_process_batch_slice_single_process():
    per, off = process_batch_slice(64)
    assert per == 64 // jax.process_count()
    assert off == jax.process_index() * per


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp",)


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    """REAL 2-process jax.distributed: 8-device global mesh, one sharded
    train step, identical loss on both processes (slow: ~1 min)."""
    import os
    import socket
    import subprocess
    import sys

    import pytest

    pytest.importorskip("jax")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    losses = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("LOSS ")]
        assert line, out[-2000:]
        losses.append(float(line[-1].split()[1]))
    assert losses[0] == losses[1]
    assert losses[0] > 0
