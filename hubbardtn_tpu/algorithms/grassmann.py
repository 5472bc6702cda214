"""Riemannian gradient polish on the uniform-MPS manifold.

TPU-native analog of the reference's final ``VUMPS & GradientGrassmann``
composite (/root/reference/src/HubbardFunctions.jl:1025-1027, backed by
TensorKitManifolds + OptimKit).  The tangent-space gradient at a mixed-gauge
point is g[x] = H_AC(AC[x]) - AL[x] H_C(C[x]) (zero exactly at the VUMPS
fixed point); we descend along it with backtracking line search, re-gauging
through the same positive-QR updates as VUMPS.  A nonlinear-CG momentum term
(Fletcher-Reeves, with the previous direction transported trivially in the
fixed block tables) accelerates the tail."""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS
from ..solvers.krylov import Packer, full_blocks
from ..tensor.symtensor import SymTensor, tensordot
from .environments import Environments
from .vumps import VUMPSResult, _gauge_site, apply_H_AC, apply_H_C

from ..utils.device import host_built

def _gradient(psi: UniformMPS, H: MPOHamiltonian, envs: Environments
              ) -> List[SymTensor]:
    """Tangent-space gradient in the left gauge: NL NL^dag H_AC(AC).
    The null-space projection annihilates every AL-parallel component, so
    the environment regularization constants drop out automatically."""
    from ..tensor import linalg as tla
    out = []
    for x in range(psi.T):
        AC = psi.AC(x)
        HAC = apply_H_AC(envs.GLs[x], H.Ws[x], envs.GRs[x], AC)
        NL = tla.left_null(psi.ALs[x], 2)
        Xg = tensordot(NL.conj(), HAC, axes=([0, 1], [0, 1]))
        out.append(tensordot(NL, Xg, axes=([2], [0])))
    return out


@host_built
def grassmann_polish(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-8,
                     maxiter: int = 50, alpha0: float = 0.05,
                     verbosity: int = 0,
                     envs: Optional[Environments] = None) -> VUMPSResult:
    """Gradient-descent/CG polish; returns when the gradient norm < tol."""
    envs = Environments(psi, H, tol=1e-12, prev=envs)
    energy = float(jnp.real(envs.energy_per_site))
    history: List[dict] = []
    alpha = alpha0
    prev_g = None
    prev_dir = None
    converged = False
    gnorm = np.inf
    for it in range(maxiter):
        g = _gradient(psi, H, envs)
        gnorm = float(np.sqrt(sum(float(t.norm_sq()) for t in g)))
        if gnorm < tol:
            converged = True
            break
        # Fletcher-Reeves momentum when block tables are unchanged
        direction = g
        if prev_g is not None:
            try:
                beta = (sum(float(t.norm_sq()) for t in g)
                        / sum(float(t.norm_sq()) for t in prev_g))
                direction = [gi + beta * di for gi, di in zip(g, prev_dir)]
            except Exception:
                direction = g
        def retract(a):
            ALs, ARs = [], []
            ACs_new = [psi.AC(x) - a * direction[x] for x in range(psi.T)]
            for x in range(psi.T):
                AL, AR, _dl, _dr = _gauge_site(ACs_new[x],
                                               psi.Cs[(x - 1) % psi.T],
                                               psi.Cs[x])
                ALs.append(AL)
                ARs.append(AR)
            p = UniformMPS(ALs, ARs, list(psi.Cs))
            ev = Environments(p, H, tol=1e-12, prev=envs)
            return p, ev, float(jnp.real(ev.energy_per_site))

        # baseline through the same retraction: the re-gauge at alpha=0 can
        # itself shift the energy when the input isn't exactly gauged
        _pb, _eb, e_base = retract(0.0)
        accepted = False
        for _trial in range(6):
            psi_try, envs_try, e_try = retract(alpha)
            if e_try <= e_base + 1e-14:
                psi, envs, energy = psi_try, envs_try, e_try
                alpha = min(alpha * 1.5, 1.0)
                accepted = True
                break
            alpha /= 3.0
        history.append({"iter": it, "energy": energy, "gnorm": gnorm,
                        "alpha": alpha})
        if verbosity >= 2:
            print(f"[grassmann] it={it:3d} e={energy:+.12f} |g|={gnorm:.3e} "
                  f"alpha={alpha:.2e}{'' if accepted else ' (stuck)'}")
        if not accepted:
            break  # line search failed: at numerical floor
        prev_g, prev_dir = g, direction
    if verbosity >= 1:
        print(f"[grassmann] done: e={energy:+.12f} |g|={gnorm:.3e}")
    return VUMPSResult(psi, envs, energy, float(gnorm), len(history),
                       converged, history)
