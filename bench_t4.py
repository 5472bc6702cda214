"""T=4 fused-vs-staged equality ON THE CHIP.

The whole-iteration fused program for 4-site unit cells (every multi-band
strip and every spin model, /root/reference/src/HubbardFunctions.jl:811-910)
cannot be validated on XLA CPU: compiling it trips the image's glibc
heap-corruption bug (CLAUDE.md), so ``vumps_fused_loop`` falls back to the
staged driver there and the T=2 equality tests never exercise the 4-site
scan body.  This stage runs the validation where the program actually
serves users — the TPU chip: both drivers solve the same model from the
same seed, and the converged energies plus the early per-iteration traces
must agree (same bar as tests/test_fused_vumps.py, loosened for f32 chip
arithmetic).

Invoked by bench.py as a fresh subprocess; also runnable standalone.
Emits one JSON line with ``t4_*`` fields.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _models():
    from hubbardtn_tpu.models.hubbard import MBSim
    # 2-band abelian strip with interband + inter-site hopping: T*B = 4
    t = np.hstack([0.2 * (np.ones((2, 2)) - np.eye(2)), np.eye(2)])
    u = np.hstack([2.0 * np.eye(2), np.zeros((2, 2))])
    mb2 = MBSim(t=t, u=u, J=np.zeros((2, 2)), P=1, Q=1, bond_dim=4)
    # 2-band spin model (the exact family whose goldens pin HTN_NO_FUSED=1
    # on CPU, tests/test_golden_parity.py:74)
    ts = np.hstack([np.zeros((2, 2)), np.eye(2)])
    us = np.hstack([3.0 * np.eye(2), np.zeros((2, 2))])
    spin = MBSim(t=ts, u=us, J=np.zeros((2, 2)), P=1, Q=1, bond_dim=4,
                 spin=True)
    return {"mb2": mb2, "spin": spin}


def _run(sim, fused: bool, tol: float, maxiter: int):
    import jax

    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.models.hubbard import hamiltonian
    from hubbardtn_tpu.mps.imps import initialize_mps

    os.environ["HTN_NO_FUSED"] = "" if fused else "1"
    # device contract (utils/device.py): the eager structure build runs
    # on the host CPU backend -- on the tunneled chip every eager op is
    # an RPC round trip (~0.5 s EACH; an unpinned build stalls for tens
    # of minutes).  vumps is @host_built and manages placement itself.
    with jax.default_device(jax.devices("cpu")[0]):
        H = hamiltonian(sim)
        psi = initialize_mps(H.site.group, H.site.space, sim.T,
                             bond_dim=sim.bond_dim, seed=3)
    res = vumps(psi, H, tol=tol, maxiter=maxiter)
    used_fused = bool(res.history) and all(
        "fused" in h["stage_ms"] for h in res.history)
    return res, used_fused


def validate(name: str, sim, maxiter: int = 8) -> dict:
    """Per-iteration TRACE equality over ``maxiter`` iterations from the
    same seed (tol 1e-12: neither driver converges early).

    The trace IS the program-equality check — each fused iteration must
    be the same traced computation the staged driver dispatches.  A
    converged-energy comparison would be stronger physics but the staged
    driver pays ~200 host-checked dispatches per iteration over the
    tunnel (~75 s/iter measured under load): running it to convergence
    fits no bench window."""
    t0 = time.perf_counter()
    rf, fused_used = _run(sim, fused=True, tol=1e-12, maxiter=maxiter)
    rs, _ = _run(sim, fused=False, tol=1e-12, maxiter=maxiter)
    n = min(len(rf.history), len(rs.history))
    des = [abs(rf.history[i]["energy"] - rs.history[i]["energy"])
           for i in range(n)]
    derr = [abs(rf.history[i]["error"] - rs.history[i]["error"])
            for i in range(n)]
    # f32 on chip: the same math in two XLA programs rounds differently
    # and the gap grows along the trajectory; early iterations must
    # stay at f32-noise scale
    ok = bool(fused_used and n == maxiter
              and max(des) < 1e-3 and des[0] < 1e-4)
    return {
        f"t4_{name}_fused_used": fused_used,
        f"t4_{name}_iters_compared": n,
        f"t4_{name}_e_fused_last": float(rf.history[n - 1]["energy"]),
        f"t4_{name}_e_staged_last": float(rs.history[n - 1]["energy"]),
        f"t4_{name}_trace_de_first": float(des[0]) if des else -1.0,
        f"t4_{name}_trace_de_max": float(max(des)) if des else -1.0,
        f"t4_{name}_trace_derr_max": float(max(derr)) if derr else -1.0,
        f"t4_{name}_ok": ok,
        f"t4_{name}_wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    budget = float(os.environ.get("BENCH_T4_BUDGET_S", "1200"))
    deadline = time.time() + budget
    out = {}
    for name, sim in _models().items():
        if out and time.time() > deadline - 120:
            out[f"t4_{name}_skipped"] = "budget"
            continue
        try:
            out.update(validate(name, sim))
            print(f"# t4 {name}: trace de max "
                  f"{out[f't4_{name}_trace_de_max']:.2e} "
                  f"(ok={out[f't4_{name}_ok']})", file=sys.stderr)
        except Exception as e:
            out[f"t4_{name}_error"] = str(e)[-200:]
            print(f"# t4 {name} failed: {e}", file=sys.stderr)
    oks = [v for k, v in out.items() if k.endswith("_ok")]
    out["t4_ok"] = (bool(oks) and all(oks)
                    and not any(k.endswith("_error") for k in out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
