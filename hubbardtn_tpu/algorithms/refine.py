"""Mixed-precision refinement: f32 chip solve -> f64 host energies.

The TPU serves float32 only, but the driver north star (BASELINE.json)
asks for energies to 1e-8 *relative*.  The bridge is variational
iterative refinement: a state converged on the chip to gradient error
~1e-6 carries an energy error that is *quadratic* in the state error, so
re-evaluating (and briefly re-polishing) it in float64 on the host CPU
recovers f64-grade energies at a tiny fraction of an all-f64 solve's
cost.  The expensive bond-growth/iteration schedule runs on the chip in
f32; the f64 tail runs at *fixed* block structure.

Reference scope: the reference runs everything in ComplexF64 on CPU
(src/HubbardFunctions.jl has no precision knobs); this module is the
TPU-native path to the same accuracy class.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS
from ..utils.device import host_built
from .vumps import VUMPSResult, vumps


def cast_state(psi: UniformMPS, dtype) -> UniformMPS:
    """UniformMPS with every block cast to ``dtype``."""
    return UniformMPS([t.astype(dtype) for t in psi.ALs],
                      [t.astype(dtype) for t in psi.ARs],
                      [t.astype(dtype) for t in psi.Cs])


def cast_hamiltonian(H: MPOHamiltonian, dtype) -> MPOHamiltonian:
    """MPOHamiltonian with every W block cast to ``dtype`` (new object;
    the input is untouched)."""
    Ws = []
    for W in H.Ws:
        Ws.append({ab: op.astype(dtype) for ab, op in W.items()})
    return dataclasses.replace(H, Ws=Ws)


@host_built
def refine_f64(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-10,
               maxiter: int = 30, grassmann_iters: int = 20,
               verbosity: int = 0) -> VUMPSResult:
    """f64 tail solve at fixed block structure from an f32-converged state.

    Casts the state (and, if needed, the MPO) to float64, runs VUMPS at
    the existing bond structure until the gradient clears ``tol``, and
    finishes with the transported-CG Grassmann polish — the same
    composite the reference applies as its final stage
    (/root/reference/src/HubbardFunctions.jl:1025-1027), here in the role
    of the high-precision corrector.  Requires x64 to be enabled."""
    if jnp.zeros((), jnp.float64).dtype != jnp.dtype("float64"):
        raise RuntimeError("refine_f64 requires jax_enable_x64")
    f64 = jnp.complex128 if jnp.iscomplexobj(
        jnp.zeros((), psi.ALs[0].dtype)) else jnp.float64
    psi64 = cast_state(psi, f64)
    if jnp.dtype(next(iter(H.Ws[0].values())).dtype).itemsize < 8:
        H = cast_hamiltonian(H, f64)
    # exact f64 re-canonicalization FIRST: the cast state carries the f32
    # solve's gauge error (~delta), which makes its mixed AL/AR energy a
    # non-variational estimate biased at O(delta); after re-gauging the
    # energy is a true Rayleigh quotient whose error vs the optimum at
    # this structure is QUADRATIC in the state error
    from ..mps.imps import mixed_gauge
    from .environments import Environments
    try:
        psi64 = mixed_gauge(psi64.ALs, tol=1e-13)
    except Exception:
        pass
    envs0 = Environments(psi64, H, tol=min(tol * 1e-2, 1e-12))
    e0 = float(jnp.real(envs0.energy_per_site))
    res = vumps(psi64, H, tol=tol, maxiter=maxiter,
                verbosity=max(0, verbosity - 1))
    if e0 < res.energy:
        # VUMPS is a fixed-point scheme, not a descent method: from a
        # near-converged start it can settle on a nearby stationary
        # point ABOVE the input's quotient (measured +1.2e-7 on a
        # chi-384 chip state).  Keep the better state; the polish below
        # re-measures the gradient.
        res = VUMPSResult(psi64, envs0, e0, res.error, res.iterations,
                          res.converged, res.history)
    if grassmann_iters > 0:
        from .grassmann import grassmann_polish
        gp = grassmann_polish(res.psi, H, tol=tol, maxiter=grassmann_iters,
                              verbosity=max(0, verbosity - 1), envs=res.envs)
        if gp.energy <= res.energy:
            res = VUMPSResult(gp.psi, gp.envs, gp.energy, gp.error,
                              res.iterations + gp.iterations,
                              res.converged or gp.converged,
                              res.history + gp.history)
        elif gp.history:
            # polish found no descent (the achievable decrease O(|g|^2)
            # sits below the env noise floor): keep the state, but
            # report ITS measured gradient — the polish's first
            # iteration computed it — not the error of whatever VUMPS
            # fixed point was discarded above
            res = VUMPSResult(res.psi, res.envs, res.energy,
                              float(gp.history[0]["gnorm"]),
                              res.iterations, res.converged, res.history)
    return res
