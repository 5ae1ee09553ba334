"""Driver CLIs.

The axon sitecustomize registers the remote-TPU backend and forces
`jax.config jax_platforms="axon,cpu"`, silently overriding the
`JAX_PLATFORMS` env var — so a driver launched with `JAX_PLATFORMS=cpu`
(local smoke runs, the verify recipe, CI) would still tunnel every op to
the remote chip.  Re-apply the env var's choice at package import, before
any backend initializes.
"""

import os

_requested = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _requested:
    import jax

    try:
        jax.config.update("jax_platforms", _requested)
    except Exception:  # backends already live: leave them be
        pass
