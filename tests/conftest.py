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
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    """Every test without a slow/deep/heavy marker is ``quick``: the
    sub-5-minute smoke tier (``pytest -m quick``)."""
    for item in items:
        if not any(item.get_closest_marker(m)
                   for m in ("slow", "deep", "heavy")):
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between tests.

    Keeping hundreds of large compiled XLA CPU programs alive across the
    whole suite exhausts process resources (the long-suite segfaults struck
    inside backend_compile after ~5 heavy ground-state solves in one
    process); tests rarely share jit cache entries anyway."""
    yield
    jax.clear_caches()
