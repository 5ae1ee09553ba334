import os

# Tests run on a virtual multi-device CPU mesh so sharding paths are
# exercised without TPU hardware.  The axon sitecustomize registers a
# remote-TPU backend AND forces jax.config jax_platforms="axon,cpu",
# overriding the JAX_PLATFORMS env var — so we must override the config
# again after import, not just the env.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
