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
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.models.hubbard import hamiltonian
    from hubbardtn_tpu.mps.imps import initialize_mps

    os.environ["HTN_NO_FUSED"] = "" if fused else "1"
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T,
                         bond_dim=sim.bond_dim, seed=3)
    res = vumps(psi, H, tol=tol, maxiter=maxiter)
    used_fused = bool(res.history) and all(
        "fused" in h["stage_ms"] for h in res.history)
    return res, used_fused


def validate(name: str, sim, tol: float = 1e-5, maxiter: int = 60) -> dict:
    t0 = time.perf_counter()
    rf, fused_used = _run(sim, fused=True, tol=tol, maxiter=maxiter)
    rs, _ = _run(sim, fused=False, tol=tol, maxiter=maxiter)
    de = abs(rf.energy - rs.energy)
    n = min(len(rf.history), len(rs.history), 10)
    trace_de = max(abs(rf.history[i]["energy"] - rs.history[i]["energy"])
                   for i in range(n))
    # two f32 optimizations of the same functional to err < tol: converged
    # energies agree to the variational scale (err^2) plus f32 noise;
    # early traces are the same computation in different XLA programs
    ok = bool(fused_used and rf.converged and rs.converged
              and de < 5e-5 and trace_de < 1e-3)
    return {
        f"t4_{name}_fused_used": fused_used,
        f"t4_{name}_converged": bool(rf.converged and rs.converged),
        f"t4_{name}_e_fused": float(rf.energy),
        f"t4_{name}_e_staged": float(rs.energy),
        f"t4_{name}_de": float(de),
        f"t4_{name}_trace_max_de": float(trace_de),
        f"t4_{name}_err": float(max(rf.error, rs.error)),
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
            print(f"# t4 {name}: {out[f't4_{name}_de']:.2e} "
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
