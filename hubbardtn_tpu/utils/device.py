"""Host-build / device-run placement discipline.

Deployment contract (the tunnel discipline of bench.py, promoted to the
library): the HOST owns everything eager and structure-dependent — MPO
compilation, MPS initialization, bond expansion, per-block gauge fixes,
plan construction — while the ACCELERATOR owns the structure-fixed jitted
programs (fused VUMPS iterations, environment refreshes, excitation
pipelines).  On a remote/tunneled TPU every eager op costs a host<->device
round trip (~0.5 s over this image's tunnel), and a driver run issues
thousands of small eager block ops; under this contract those all stay on
the CPU backend, and each device program ships its packed operands once
with an explicit ``device_put``.

Usage::

    with host_build():              # eager ops -> host CPU backend
        res = compute_groundstate(sim)   # jitted hot loops -> accelerator

``vumps`` and the environment engines apply ``to_accel``/``to_host`` at
their jit boundaries themselves, so the context manager is all a driver
script needs.  On a CPU-only JAX (tests) every helper is a no-op.
Set ``HTN_DEVICE=cpu`` to pin the jitted programs to the host too.
"""

from __future__ import annotations

import functools
import os
from contextlib import nullcontext

import jax

__all__ = ["accel_device", "host_device", "host_build", "host_built",
           "to_accel", "to_host"]


def accel_device():
    """First non-CPU JAX device, or None (also None under HTN_DEVICE=cpu).

    Only called at runtime (never at import): touching ``jax.devices()``
    initializes the backend, which over a down TPU tunnel hangs rather
    than erroring (CLAUDE.md), so import must stay side-effect free.
    """
    if os.environ.get("HTN_DEVICE", "") == "cpu":
        return None
    for d in jax.devices():
        if d.platform != "cpu":
            return d
    return None


def host_device():
    return jax.devices("cpu")[0]


def host_build():
    """Context manager routing eager ops to the host CPU backend.

    A no-op when no accelerator is visible.  Explicitly committed arrays
    (``to_accel``) still run their jitted programs on the accelerator —
    ``jax.default_device`` only steers uncommitted placements.
    """
    return (jax.default_device(host_device())
            if accel_device() is not None else nullcontext())


def host_built(fn):
    """Decorator: run ``fn``'s eager ops on the host CPU backend (the
    drivers' default placement; see module docstring)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with host_build():
            return fn(*args, **kwargs)

    return wrapper


def to_accel(tree):
    """Ship a pytree to the accelerator (identity when none is visible)."""
    dev = accel_device()
    return jax.device_put(tree, dev) if dev is not None else tree


def to_host(tree):
    """Pull a pytree back to the host CPU backend (identity when no
    accelerator is visible)."""
    if accel_device() is None:
        return tree
    return jax.device_put(tree, host_device())
