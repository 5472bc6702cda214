"""Riemannian conjugate-gradient polish on the uniform-MPS manifold.

TPU-native analog of the reference's final ``VUMPS & GradientGrassmann``
composite (/root/reference/src/HubbardFunctions.jl:1025-1027, backed by
TensorKitManifolds + OptimKit's transported CG with Hager-Zhang search).

The tangent-space gradient at a mixed-gauge point is
``g[x] = NL NL^dag H_AC(AC[x])`` (zero exactly at the VUMPS fixed point;
the null-space projection annihilates every AL-parallel component, so the
environment regularization constants drop out automatically).  Descent
runs in AC coordinates, which is exactly OptimKit's rho-preconditioned
AL-space direction (moving AL by ``dAL`` moves AC by ``dAL C``, so the
Euclidean AC metric equals the AL metric weighted by ``rho = C C^dag``);
a ``delta``-regularized metric ``M = C^dag (C C^dag + delta)^{-1} C``
with ``delta ~ |g|`` damps the near-null small-Schmidt directions the
same way OptimKit's regularized preconditioner does.

Search directions are Polak-Ribiere+ conjugate gradients with projection
transport (previous gradient/direction re-projected into the current
tangent space), an Armijo line search with quadratic interpolation, and a
Barzilai-Borwein initial step.  Line-search probes re-use warm-started
environments from the *previous probe* at an adaptive tolerance tied to
the gradient norm instead of re-solving a cold ``Environments`` per
trial.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS
from ..tensor.symtensor import SymTensor, tensordot
from ..utils.device import host_built
from .environments import Environments, rho_right
from .vumps import VUMPSResult, _gauge_site, apply_H_AC


def _gradient(psi: UniformMPS, H: MPOHamiltonian, envs: Environments):
    """Tangent-space gradient in the left gauge (NL NL^dag H_AC(AC)) plus
    the per-site left null spaces used to project/transport."""
    from ..tensor import linalg as tla
    out, NLs = [], []
    for x in range(psi.T):
        AC = psi.AC(x)
        HAC = apply_H_AC(envs.GLs[x], H.Ws[x], envs.GRs[x], AC)
        NL = tla.left_null(psi.ALs[x], 2)
        Xg = tensordot(NL.conj(), HAC, axes=([0, 1], [0, 1]))
        out.append(tensordot(NL, Xg, axes=([2], [0])))
        NLs.append(NL)
    return out, NLs


def _project(NLs, vs):
    """Projection-based vector transport: re-express a previous tangent
    vector in the tangent space at the current point."""
    out = []
    for NL, v in zip(NLs, vs):
        X = tensordot(NL.conj(), v, axes=([0, 1], [0, 1]))
        out.append(tensordot(NL, X, axes=([2], [0])))
    return out


def _norm2(vs) -> float:
    return sum(float(jnp.real(t.norm_sq())) for t in vs)


def _re_inner(a, b) -> float:
    """Re<a, b> summed over sites via the polarization identity (works for
    both block-tensor backends without touching block internals)."""
    s = 0.0
    for ai, bi in zip(a, b):
        s += 0.5 * (float(jnp.real((ai + bi).norm_sq()))
                    - float(jnp.real(ai.norm_sq()))
                    - float(jnp.real(bi.norm_sq())))
    return s


def _ac_metric(C, delta: float):
    """M = C^dag (C C^dag + delta)^{-1} C on the right bond.

    delta -> 0 recovers the identity (pure AC descent = OptimKit's
    rho-preconditioned AL gradient); delta > 0 contracts motion along
    Schmidt directions with s^2 < delta, whose H_AC residuals are noise."""
    from ..tensor.linalg import diag_tensor, eigh
    rho = rho_right(C)                       # C C^dag, (IN, OUT)
    vals, U = eigh(rho)                      # rho = U diag(w) U^dag
    inv = {q: 1.0 / (jnp.maximum(w, 0.0) + delta) for q, w in vals.items()}
    D = diag_tensor(C.group, U.spaces[1], inv, dtype=C.dtype)
    R = tensordot(U, D, axes=([1], [0]))
    inv_rho = tensordot(R, U.conj(), axes=([1], [1]))   # (IN, OUT)
    tmp = tensordot(C.conj(), inv_rho, axes=([0], [0]))
    return tensordot(tmp, C, axes=([1], [0]))           # (vr IN, vr OUT)


@host_built
def grassmann_polish(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-8,
                     maxiter: int = 50, alpha0: float = 0.1,
                     verbosity: int = 0,
                     envs: Optional[Environments] = None,
                     method: str = "cg") -> VUMPSResult:
    """Transported-CG polish; returns when the gradient norm < tol.

    Line-search acceptance is *derivative-based* (OptimKit/Hager-Zhang's
    approximate-Wolfe rationale): near the optimum the achievable energy
    decrease per step is O(|g|^2), far below the environment-solve noise
    floor, while directional derivatives stay accurate to a *relative*
    tolerance — so the search does secant steps on
    phi'(a) = -2 Re<g(psi_a), tau(d)> and accepts on the curvature
    condition |phi'(a)| <= sigma |phi'(0)|.

    ``method="gd"`` disables the CG momentum (plain preconditioned
    steepest descent with the same line search) — the A/B baseline the
    regression test compares iteration counts against."""
    if method not in ("cg", "gd"):
        raise ValueError(f"unknown method {method!r}")
    T = psi.T

    def retract(point, direction, a, warm, env_tol):
        """psi(alpha) = gauge(AC - a*direction) with warm-started envs."""
        ALs, ARs = [], []
        for x in range(T):
            ACx = point.AC(x) if direction is None else (
                point.AC(x) - a * direction[x])
            AL, AR, _dl, _dr = _gauge_site(ACx, point.Cs[(x - 1) % T],
                                           point.Cs[x])
            ALs.append(AL)
            ARs.append(AR)
        p = UniformMPS(ALs, ARs, list(point.Cs))
        ev = Environments(p, H, tol=env_tol, prev=warm)
        return p, ev, float(jnp.real(ev.energy_per_site))

    # gauge-normalize the input once: every later accepted trial is a
    # gauged state whose energy/envs/gradient stay current
    psi, envs, energy = retract(psi, None, 0.0, envs, 1e-12)
    g, NLs = _gradient(psi, H, envs)

    history: List[dict] = []
    alpha = alpha0
    prev_g = prev_d = prev_denom = None
    prev_alpha = None
    converged = False
    sigma = 0.5          # curvature acceptance |phi'(a)| <= sigma*|phi'(0)|
    gnorm = np.inf
    for it in range(maxiter):
        gnorm = float(np.sqrt(max(_norm2(g), 0.0)))
        if gnorm < tol:
            converged = True
            break
        delta = max(1e-12, gnorm)
        Ms = [_ac_metric(psi.Cs[x], delta) for x in range(T)]
        pg = [tensordot(g[x], Ms[x], axes=([2], [0])) for x in range(T)]
        denom = _re_inner(g, pg)            # preconditioned norm^2 > 0

        direction = pg
        alpha_init = min(1.5 * alpha, 2.0)
        if prev_g is not None and method == "cg":
            gT = _project(NLs, prev_g)
            dT = _project(NLs, prev_d)
            # Polak-Ribiere+ with projection transport
            beta = max(0.0, (denom - _re_inner(gT, pg))
                       / max(prev_denom, 1e-300))
            cand = [pg[x] + beta * dT[x] for x in range(T)]
            if _re_inner(cand, g) > 0.0:    # descent direction check
                direction = cand
            # Barzilai-Borwein initial step from (s, y) of the last move:
            # s = -prev_alpha * dT, y = g - gT
            sy = prev_alpha * (_re_inner(dT, gT) - _re_inner(dT, g))
            ss = prev_alpha * prev_alpha * _norm2(dT)
            if sy > 0.0 and np.isfinite(sy):
                alpha_init = float(np.clip(ss / sy, 0.05 * alpha, 2.0))
        der0 = -2.0 * _re_inner(g, direction)
        if der0 >= 0.0:                     # lost descent: restart on pg
            direction = pg
            der0 = -2.0 * denom

        # directional-derivative line search: secant toward phi'(a) = 0,
        # each probe warm-starting its environments from the previous
        # probe's.  Gradients need only RELATIVE accuracy, so env_tol
        # scales with |g|.  ENERGIES are not used for acceptance: the
        # estimate of an imperfectly-gauged state carries an O(gauge err)
        # bias that legitimately *rises* toward the fixed point's true
        # energy as the polish converges, so near convergence the energy
        # signal is pure noise while phi' stays clean — only a loose
        # catastrophe guard rejects on energy.
        env_tol = float(np.clip(gnorm * 1e-3, 1e-12, 1e-10))
        e_guard = energy + 1e-5 * (abs(energy) + 1.0)
        a = alpha_init
        accepted = False
        warm = envs
        trial_state = None
        for _trial in range(10):
            psi_t, envs_t, e_t = retract(psi, direction, a, warm, env_tol)
            warm = envs_t
            g_t, NLs_t = _gradient(psi_t, H, envs_t)
            der_a = -2.0 * _re_inner(g_t, _project(NLs_t, direction))
            bad = e_t > e_guard
            if verbosity >= 3:
                print(f"[grassmann]   trial a={a:.3e} e={e_t:+.12f} "
                      f"der0={der0:+.3e} der_a={der_a:+.3e} bad={bad}")
            if not bad and abs(der_a) <= sigma * abs(der0):
                trial_state = (psi_t, envs_t, e_t, g_t, NLs_t)
                accepted = True
                break
            if der_a > 0.0 or bad:
                # overshot the minimum along d (or the energy blew up):
                # secant back into (0, a)
                a_new = a * der0 / (der0 - der_a) if der_a > 0.0 else 0.3 * a
                a = float(np.clip(a_new, 0.05 * a, 0.6 * a))
            else:
                # still descending steeply: this branch is only reached
                # with der_a <= sigma*der0 < 0 (the weak Wolfe-1 bound on
                # the derivative holds by the branch condition), so the
                # step is accepted; probe one extension, which must ITSELF
                # keep the Wolfe-1 derivative bound (not merely der_e < 0)
                trial_state = (psi_t, envs_t, e_t, g_t, NLs_t)
                accepted = True
                a_ext = 2.0 * a
                psi_e, envs_e, e_e = retract(psi, direction, a_ext, warm,
                                             env_tol)
                g_e, NLs_e = _gradient(psi_e, H, envs_e)
                der_e = -2.0 * _re_inner(g_e, _project(NLs_e, direction))
                if der_e <= sigma * der0 and e_e <= e_guard:
                    trial_state = (psi_e, envs_e, e_e, g_e, NLs_e)
                    a = a_ext
                break
        history.append({"iter": it, "energy": energy, "gnorm": gnorm,
                        "alpha": a})
        if verbosity >= 2:
            print(f"[grassmann] it={it:3d} e={energy:+.12f} |g|={gnorm:.3e} "
                  f"alpha={a:.2e}{'' if accepted else ' (stuck)'}")
        if not accepted:
            break  # line search failed: at the numerical floor
        psi, envs, energy, g_new, NLs_new = trial_state
        prev_g, prev_d, prev_denom, prev_alpha = g, direction, denom, a
        g, NLs = g_new, NLs_new
        alpha = a
    if verbosity >= 1:
        print(f"[grassmann] done: e={energy:+.12f} |g|={gnorm:.3e}")
    # final environments at full accuracy for the returned result
    envs = Environments(psi, H, tol=1e-12, prev=envs)
    energy = float(jnp.real(envs.energy_per_site))
    return VUMPSResult(psi, envs, energy, float(gnorm), len(history),
                       converged, history)
