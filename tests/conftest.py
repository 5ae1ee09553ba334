import os

# Tests run on a virtual multi-device CPU mesh so sharding paths are
# exercised without TPU hardware.  Note JAX_PLATFORMS=axon is preset in the
# environment (remote TPU tunnel) — it MUST be overridden here, otherwise
# every eager op becomes a network round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
