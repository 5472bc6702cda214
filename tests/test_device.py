"""Device-placement utilities (utils/device.py).

On the CPU-only test backend every helper must be an exact no-op: the
drivers are wrapped in ``host_built`` unconditionally, so the identity
path is the one every other test exercises implicitly.  The accelerator
path is validated on hardware by examples/tpu_groundstate.py and the
bench (same contract bench.py has always used)."""

import jax.numpy as jnp
import numpy as np

from hubbardtn_tpu.utils.device import (accel_device, host_build,
                                        host_built, to_accel, to_host)


def test_no_accel_on_cpu_backend():
    assert accel_device() is None


def test_to_accel_to_host_identity():
    tree = {"a": jnp.arange(3.0), "b": [jnp.ones((2, 2))]}
    assert to_accel(tree) is tree
    assert to_host(tree) is tree


def test_host_build_nullcontext():
    with host_build():
        x = jnp.ones((4,))
    assert float(x.sum()) == 4.0


def test_host_built_wrapper_passthrough():
    @host_built
    def f(a, b=2):
        return a * b

    assert f(3) == 6
    assert f.__name__ == "f"


def test_htn_device_cpu_pin(monkeypatch):
    monkeypatch.setenv("HTN_DEVICE", "cpu")
    assert accel_device() is None
    x = np.arange(4.0)
    assert to_accel(x) is x
