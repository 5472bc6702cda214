"""Full ground-state driver on a real TPU chip (end to end).

This is the production deployment shape (reference entry:
/root/reference/src/HubbardFunctions.jl:993-1030): the COMPLETE
`compute_groundstate` composition — IDMRG2/VUMPS bond adaptation, the
fused whole-iteration VUMPS loops, and the Grassmann polish — with the
device contract of hubbardtn_tpu/utils/device.py: every eager
structure-level op runs on the host CPU backend, every structure-fixed
jitted program (fused iterations, environment refreshes) runs on the
TPU.  Over this image's tunneled chip an eager op costs ~0.5 s of RPC;
under the contract a full driver run issues only a handful of device
dispatches per VUMPS chunk.

TPU serves float32 (the chip has no f64), so drive to tol ~1e-6; the
f64 path for 1e-8-grade convergence is the CPU backend (see
tests/test_deep_convergence.py).

Usage:
    HTN_COMPILE_CACHE=/tmp/htn_xla_cache python examples/tpu_groundstate.py [u] [tol]

The compile cache matters: each bond structure compiles its fused
program once (~1-3 min); repeat runs at the same schedule start hot.
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("HTN_COMPILE_CACHE", "/tmp/htn_xla_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from hubbardtn_tpu import OBSim, compute_groundstate  # noqa: E402


def main():
    import jax

    u = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6

    devs = jax.devices()
    print(f"devices: {[f'{d.platform}:{d.id}' for d in devs]}")

    sim = OBSim(t=(1.0,), u=(u,), P=1, Q=1)
    t0 = time.perf_counter()
    out = compute_groundstate(sim, tol=tol, verbosity=2)
    wall = time.perf_counter() - t0
    psi = out["groundstate"]
    print(f"E/site = {out['energy']:+.10f}   err = {out['delta']:.3e}   "
          f"bonds = {psi.bond_dims()}   wall = {wall:.1f} s")
    if u == 0.0:
        print(f"exact (Bethe, u=0): {-4 / np.pi:+.10f}")


if __name__ == "__main__":
    main()
