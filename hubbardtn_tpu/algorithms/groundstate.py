"""Composite ground-state driver.

TPU-native equivalent of the reference's ``compute_groundstate``
(/root/reference/src/HubbardFunctions.jl:993-1030): solve, adapt the bond
dimension until the Schmidt spectrum is resolved below 10^-svalue (the
``truncbelow``/IDMRG2 semantics) or the total bond dimension stabilizes
within 5% (the VUMPSSvdCut expansion-loop semantics, :1019-1023), then
polish at fixed spaces.

The bond adaptation is expansion-based (two-site residual direct sums) so
every intermediate state stays exactly gauged and block tables only change
at expansion points — between expansions all jitted structures are stable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS, initialize_mps
from ..tensor.linalg import Truncation
from .changebonds import expand_bonds, svd_cut
from .environments import Environments
from .vumps import VUMPSResult, vumps


def _min_schmidt(psi: UniformMPS) -> float:
    """Smallest Schmidt value across all bonds."""
    out = np.inf
    for x in range(psi.T):
        for q, s in psi.entanglement_spectrum(x).items():
            if s.size:
                out = min(out, float(np.min(s)))
    return out


def find_groundstate(psi: UniformMPS, H: MPOHamiltonian, svalue: float = 2.0,
                     tol: float = 1e-8, max_rounds: int = 8,
                     round_iters: int = 40, final_iters: int = 200,
                     max_bond: Optional[int] = None, verbosity: int = 0
                     ) -> VUMPSResult:
    """VUMPS with bond expansion until the Schmidt cutoff 10^-svalue is
    resolved, then a fixed-space polish."""
    cutoff = 10.0 ** (-svalue)
    res = None
    prev_dims = None
    trunc = Truncation(cutoff=cutoff,
                       max_dim=max_bond * psi.T if max_bond else None)
    for rnd in range(max_rounds):
        res = vumps(psi, H, tol=max(tol, cutoff * 1e-2), maxiter=round_iters,
                    verbosity=max(0, verbosity - 1),
                    envs=res.envs if res else None)
        # what would survive truncation at the Schmidt cutoff?
        psi_t = svd_cut(res.psi, trunc)
        dims = sum(psi_t.bond_dims())
        if verbosity >= 1:
            print(f"[gs] round {rnd}: e={res.energy:+.10f}"
                  f" bonds={res.psi.bond_dims()} -> cut {psi_t.bond_dims()}"
                  f" err={res.error:.2e}")
        if prev_dims is not None and dims <= prev_dims * 1.05:
            psi = psi_t  # converged in bond dimension (reference 5% rtol)
            break
        prev_dims = dims
        if max_bond is not None and dims >= max_bond * psi.T:
            psi = psi_t
            break
        grow = max(4, int(0.5 * dims / psi.T))
        psi = expand_bonds(res.psi, H, res.envs,
                           Truncation(rel_cutoff=1e-8, max_dim=grow))
        res = None  # environments/jit structures are stale after expansion
    res = vumps(psi, H, tol=tol, maxiter=final_iters,
                verbosity=max(0, verbosity - 1))
    if verbosity >= 1:
        print(f"[gs] final: e={res.energy:+.10f} bonds={res.psi.bond_dims()}"
              f" err={res.error:.2e} converged={res.converged}")
    return res


def compute_groundstate(sim, tol: float = 1e-8, verbosity: int = 0,
                        max_rounds: int = 8, max_bond: Optional[int] = None,
                        seed: int = 1, round_iters: int = 40,
                        final_iters: int = 200) -> dict:
    """Reference-compatible entry (:993-1030): returns a dict with the
    ground state, environments, Hamiltonian, and convergence error."""
    from ..models.hubbard import hamiltonian
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T,
                         bond_dim=getattr(sim, "bond_dim", 50), seed=seed)
    res = find_groundstate(psi, H, svalue=getattr(sim, "svalue", 2.0),
                           tol=tol, max_rounds=max_rounds, max_bond=max_bond,
                           round_iters=round_iters, final_iters=final_iters,
                           verbosity=verbosity)
    return {
        "groundstate": res.psi,
        "environments": res.envs,
        "ham": H,
        "delta": res.error,
        "energy": res.energy,
        "config": sim,
    }
