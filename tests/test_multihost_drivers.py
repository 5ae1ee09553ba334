"""REAL 2-process multihost runs of the actual driver CLIs.

Unlike tests/multihost_worker.py (which exercises the train-step library
path), these spawn ``drivers/multihost.py`` — jax.distributed in front of
the unmodified learn/selfplay mains — so the coordinator-gated writes,
broadcast tail-reads, and replicated host fetches are validated on the
code users run (VERDICT round-1 item 1; reference deployment
/root/reference/README.md:128-135 re-expressed per SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(tmp_path, driver, driver_args, timeout=1800):
    """Run the multihost launcher as 2 processes x 4 virtual CPU devices.

    The generous timeout is compile time, not run time: each process
    XLA-compiles the full driver program on a single contended CPU core.
    """
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"  # drivers/__init__ re-applies via jax.config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "takzero_tpu.drivers.multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                driver, "--",
            ]
            + driver_args,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    finally:
        for p in procs:  # never leak the pair on timeout/assertion
            if p.poll() is None:
                p.kill()
                p.communicate()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def test_multihost_learn_then_selfplay_drivers(tmp_path):
    d = str(tmp_path)

    # ---- learn: pre-training over the 8-device global mesh ----
    outs = _launch(
        tmp_path,
        "learn",
        [
            "--directory", d, "--net", "tiny3", "--seed", "1",
            "--batch-size", "8", "--pretrain-targets", "32",
            "--pretrain-steps", "2", "--max-steps", "0", "--no-wait",
        ],
    )
    assert any("multihost: process 0/2" in o for o in outs)
    assert any("multihost: process 1/2" in o for o in outs)
    assert (tmp_path / "model_latest.ckpt").exists()
    assert (tmp_path / "model_0000002.ckpt").exists()
    # Coordinator-gated writes: the pre-training targets were appended by
    # exactly one process (a double write would show 64 lines).
    lines = (tmp_path / "targets-initial.txt").read_text().splitlines()
    assert len(lines) == 32

    # ---- selfplay: game batch sharded over the same global mesh ----
    outs = _launch(
        tmp_path,
        "selfplay",
        [
            "--directory", d, "--net", "tiny3", "--seed", "3",
            "--batch", "8", "--budget", "16", "--sampled", "4",
            "--max-steps", "30",
        ],
    )
    coord_out = next(o for o in outs if "multihost: process 0/2" in o)
    # The coordinator's own per-move target counts must equal the file —
    # a second writer would double them.
    import re

    logged = sum(
        int(m.group(1))
        for m in re.finditer(r"; (\d+) targets, \d+ replays", coord_out)
    )
    written = 0
    tgt = tmp_path / "targets-selfplay.txt"
    if tgt.exists():
        written = len(tgt.read_text().splitlines())
    assert written == logged
    # Both processes ran every move in lockstep.
    other = next(o for o in outs if "multihost: process 1/2" in o)
    assert "step 30:" in coord_out and "step 30:" in other

    # ---- learn again: coordinator tails the new targets and broadcasts
    # them; both processes train identical replicated params ----
    outs = _launch(
        tmp_path,
        "learn",
        [
            "--directory", d, "--net", "tiny3", "--seed", "5",
            "--batch-size", "8", "--pretrain-steps", "0",
            "--max-steps", "2", "--no-wait",
        ],
    )
    assert any("resuming from" in o for o in outs)
    if written >= 16:  # enough targets for 2 full batches -> steps ran
        assert any("step 3: loss=" in o for o in outs)
