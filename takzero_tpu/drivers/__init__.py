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
    if _requested.startswith("cpu") and "--devices" in sys.argv:
        try:
            _n = int(sys.argv[sys.argv.index("--devices") + 1])
            if _n > 1:
                jax.config.update("jax_num_cpu_devices", _n)
        except Exception:  # malformed flag / backend live: CLI reports it
            pass
