import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled, per the
# driver contract: multi-chip sharding is validated on host devices; the
# single real TPU chip is reserved for benchmarks.  JAX_PLATFORMS=axon is
# force-set by the image's sitecustomize, so override it explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
