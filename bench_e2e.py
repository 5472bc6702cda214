"""End-to-end production ground-state solve: the bench's subprocess stages.

The north star (BASELINE.json:5, SURVEY.md section 6) is *time to
solution* for the reference's unit of work — a full ``compute_groundstate``
solve (/root/reference/src/HubbardFunctions.jl:993-1030) — on one TPU
chip, with energies trustworthy to ~1e-8 relative.  ``bench.py`` invokes
this file as a subprocess in three modes, each printing ONE JSON line on
stdout:

* ``solve``  — the production composition (VUMPS + expansion schedule,
  fused whole-iteration programs) on the chip in f32, from a given
  compile-cache directory.  Run twice by the parent: once against a fresh
  cache (cold: includes every XLA compile) and once against the populated
  cache (warm: the deployment steady state).  ``JAX_LOG_COMPILES`` is set
  by the parent, which counts compile events from stderr.
* ``energy`` — evaluate a saved (f32) state's energy in float64 on the
  host CPU: cast + f64 environment fixed points + Rayleigh quotient.
  Because the state error enters the variational energy quadratically,
  an f32-converged state (gradient ~1e-6) yields an f64-grade energy.
* ``refine`` — the full mixed-precision tail (algorithms/refine.py):
  f64 VUMPS + transported-CG Grassmann polish at fixed structure, then
  compare against the exact Lieb-Wu integral (models/exact.py).

Subprocess isolation keeps the dtype/platform configs clean: the chip
run stays x64-free (the TPU serves f32 only), the host runs force
JAX_PLATFORMS=cpu with x64 on.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sim(args):
    from hubbardtn_tpu.models.hubbard import OBSim
    return OBSim(t=(1.0,), u=(args.u,), P=1, Q=1,
                 bond_dim=args.bond_dim, svalue=args.svalue)


def mode_solve(args):
    # TPU (axon) platform, f32 by default (no x64).  The parent sets
    # HTN_COMPILE_CACHE; expansion-driven recompiles are the dominant
    # cold cost this stage exists to measure.
    import jax  # noqa: F401  (axon backend init)

    from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
    from hubbardtn_tpu.io.serialize import save_state

    sim = _sim(args)
    t0 = time.perf_counter()
    out = compute_groundstate(sim, tol=args.tol, verbosity=2,
                              max_rounds=args.max_rounds,
                              max_bond=args.max_bond,
                              round_iters=args.round_iters,
                              final_iters=args.final_iters,
                              algorithm="vumps", grassmann_iters=0)
    wall = time.perf_counter() - t0
    psi = out["groundstate"]
    bonds = [int(b) for b in psi.bond_dims()]
    if args.save:
        save_state(psi, args.save)
    print(json.dumps({
        "wall_s": round(wall, 1),
        "energy": float(out["energy"]),
        "delta": float(out["delta"]),
        "iters": int(out.get("iterations", 0)),
        "bonds": bonds,
        "chi": max(bonds),
    }))


def _host_cpu_f64():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def mode_energy(args):
    _host_cpu_f64()
    import jax.numpy as jnp

    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.algorithms.refine import cast_state
    from hubbardtn_tpu.io.serialize import load_state
    from hubbardtn_tpu.models.exact import lieb_wu_energy
    from hubbardtn_tpu.models.hubbard import hamiltonian
    from hubbardtn_tpu.mps.imps import mixed_gauge

    t0 = time.perf_counter()
    psi = cast_state(load_state(args.state), jnp.float64)
    H = hamiltonian(_sim(args))
    # raw eval: the loaded chip state still carries its f32-solve gauge
    # error (~delta), which biases the mixed AL/AR energy estimate at
    # O(gauge err) — typically LOW (measured: 3.6e-6 below the true
    # chi-384 optimum at delta 7e-5)
    envs = Environments(psi, H, tol=1e-12)
    e64_raw = float(jnp.real(envs.energy_per_site))
    # gauged eval: exact f64 re-canonicalization of the SAME state, then
    # the energy is a true variational Rayleigh quotient — its error vs
    # the all-f64 optimum at this structure is QUADRATIC in the f32
    # state error (the mixed-precision north-star chain)
    psi_g = mixed_gauge(psi.ALs, tol=1e-13)
    envs_g = Environments(psi_g, H, tol=1e-12)
    e64_gauged = float(jnp.real(envs_g.energy_per_site))
    exact = lieb_wu_energy(args.u)
    print(json.dumps({
        "e_f64_eval": e64_raw,
        "e_f64_eval_gauged": e64_gauged,
        "exact": exact,
        "rel_err_vs_exact": abs(e64_gauged - exact) / abs(exact),
        "rel_err_vs_exact_raw": abs(e64_raw - exact) / abs(exact),
        "wall_s": round(time.perf_counter() - t0, 1),
    }))


def mode_refine(args):
    _host_cpu_f64()
    import jax.numpy as jnp

    from hubbardtn_tpu.algorithms.refine import refine_f64
    from hubbardtn_tpu.io.serialize import load_state
    from hubbardtn_tpu.models.exact import lieb_wu_energy
    from hubbardtn_tpu.models.hubbard import hamiltonian

    t0 = time.perf_counter()
    psi = load_state(args.state)
    H = hamiltonian(_sim(args))
    res = refine_f64(psi, H, tol=args.tol, maxiter=args.final_iters,
                     grassmann_iters=args.grassmann_iters, verbosity=1)
    exact = lieb_wu_energy(args.u)
    print(json.dumps({
        "e_f64_refined": float(res.energy),
        "grad_err": float(res.error),
        "exact": exact,
        "rel_err_vs_exact": abs(res.energy - exact) / abs(exact),
        "refine_iters": int(res.iterations),
        "wall_s": round(time.perf_counter() - t0, 1),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["solve", "energy", "refine"])
    p.add_argument("--u", type=float, default=2.0)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--svalue", type=float, default=6.0)
    p.add_argument("--bond-dim", type=int, default=64)
    p.add_argument("--max-bond", type=int, default=2048)
    p.add_argument("--max-rounds", type=int, default=10)
    p.add_argument("--round-iters", type=int, default=30)
    p.add_argument("--final-iters", type=int, default=150)
    p.add_argument("--grassmann-iters", type=int, default=15)
    p.add_argument("--save", type=str, default="")
    p.add_argument("--state", type=str, default="")
    args = p.parse_args()
    {"solve": mode_solve, "energy": mode_energy,
     "refine": mode_refine}[args.mode](args)


if __name__ == "__main__":
    main()
