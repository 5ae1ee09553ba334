"""Driver CLIs.

The axon sitecustomize registers the remote-TPU backend and forces
`jax.config jax_platforms="axon,cpu"`, silently overriding the
`JAX_PLATFORMS` env var — so a driver launched with `JAX_PLATFORMS=cpu`
(local smoke runs, the verify recipe, CI) would still tunnel every op to
the remote chip.  Re-apply the env var's choice at package import, before
any backend initializes.
"""

import os
import sys


def _devices_requested(argv) -> int | None:
    """Value of `--devices N` / `--devices=N` in argv, or None.

    Last occurrence wins (argparse semantics); malformed values are left
    for argparse to report.
    """
    n = None
    for i, a in enumerate(argv):
        if a == "--devices" and i + 1 < len(argv):
            n = argv[i + 1]
        elif a.startswith("--devices="):
            n = a.split("=", 1)[1]
    try:
        return int(n) if n is not None else None
    except ValueError:
        return None


_requested = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _requested:
    import jax

    try:
        jax.config.update("jax_platforms", _requested)
    except Exception:  # backends already live: leave them be
        pass

    # `--devices N` on the CPU backend needs N virtual devices; grow the
    # pool before the backend initializes so local smoke runs don't need
    # XLA_FLAGS=--xla_force_host_platform_device_count.
    if _requested.startswith("cpu"):
        _n = _devices_requested(sys.argv)
        if _n and _n > 1:
            try:
                jax.config.update("jax_num_cpu_devices", _n)
            except Exception:  # backend already live: CLI reports it
                pass
