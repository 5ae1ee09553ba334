"""Multi-host initialization and deployment topology.

The reference cluster runs 1 learn + 10 selfplay + 10 reanalyze processes,
one GPU each, coordinating purely over a shared filesystem
(README.md:128-135).  The TPU deployment keeps that decoupled topology —
each *job* is one of our drivers pointed at the shared ``--directory`` —
and adds in-job scale-out:

* **within a slice**: one process per host, all hosts cooperating in a
  single jitted program — call :func:`initialize` first, then build the
  global mesh with :func:`global_mesh`; GSPMD shards the env/target batch
  over all chips and inserts ICI collectives;
* **across jobs** (selfplay fleet vs learner): stays on the filesystem
  protocol (parallel/coordinator.py) — proven, elastic (add/kill actors
  freely, SURVEY.md §5.3), and storage-backed.

Example (one selfplay job on a 4-host slice)::

    python -c "
    from takzero_tpu.parallel import multihost
    multihost.initialize()             # uses TPU env vars on each host
    " && python -m takzero_tpu.drivers.selfplay --directory /shared/run ...
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-environment auto-detection.

    On Cloud TPU slices all three arguments are inferred; pass them
    explicitly for CPU/GPU test rigs.  Safe to call once per process,
    before any jax computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "dp"):
    """1-D mesh over every chip in the job (all hosts)."""
    from .mesh import make_mesh

    return make_mesh(axis=axis)


def is_coordinator() -> bool:
    """Process 0 owns every filesystem WRITE in multihost driver mode
    (checkpoints, target/replay appends, metrics, buffer lengths) — the
    other processes run the identical collective compute but stay silent
    so shared files are written exactly once."""
    return jax.process_index() == 0


def broadcast_scalar(value) -> int:
    """Coordinator's integer scalar (flag, seed) to every process.
    Collective: every process must call this at the same point.  Values
    must fit int32 (jax x64 is off); both current uses — read-gate flags
    and 31-bit seeds — do."""
    import numpy as np
    from jax.experimental import multihost_utils as mhu

    return int(mhu.broadcast_one_to_all(np.int64(int(value))))


def broadcast_lines(lines: list[str] | None) -> list[str]:
    """Coordinator's text lines to every process.

    The learner's target-file tailing is NOT deterministic across
    processes (each would observe a different prefix of a file being
    appended to), so in multihost mode only the coordinator reads and the
    result is broadcast — keeping every process's replay buffer, batch
    draw, and therefore replicated parameters bit-identical.  Collective;
    non-coordinators pass anything (``None``).
    """
    import numpy as np
    from jax.experimental import multihost_utils as mhu

    payload = "\n".join(lines).encode("utf-8") if lines else b""
    n = int(mhu.broadcast_one_to_all(np.int64(len(payload))))
    if n == 0:
        return []
    buf = np.zeros(n, np.uint8)
    if is_coordinator():
        buf = np.frombuffer(payload, np.uint8).copy()
    buf = np.asarray(mhu.broadcast_one_to_all(buf))
    return buf.tobytes().decode("utf-8").split("\n")


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch, offset): split a batch over processes for
    host-local data feeding (each host builds its slice of the batch;
    jax.make_array_from_process_local_data assembles the global array)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    assert per * n == global_batch, (
        f"global batch {global_batch} must be a multiple of the "
        f"{n} processes"
    )
    return per, i * per
