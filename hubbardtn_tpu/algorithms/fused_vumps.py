"""Whole-iteration fused VUMPS: one XLA program per iteration.

The staged driver (algorithms/vumps.py) composes each iteration out of
host-sequenced jitted stages: per-site Lanczos restarts (one dispatch and
one scalar host sync per restart), per-site gauge updates, and the two
environment refreshes (plus host-checked GMRES retries).  That is ~8-15
dispatches and host syncs per iteration; over the tunneled TPU every
dispatch is an RPC round trip, and on-chip the host round trips leave the
MXU idle between stages.

This module fuses ONE COMPLETE VUMPS ITERATION into a single jitted
program (reference behavior: one iteration of MPSKit's VUMPS loop,
/root/reference/src/HubbardFunctions.jl:1012,1017,1025):

* all T sites' H_AC / H_C ground-state solves as device
  ``lax.while_loop`` restart loops around the early-exiting Lanczos core
  (solvers/krylov._lanczos_restart_core) on the bucketed batched matvecs;
* the polar (f32) or QR (f64) gauge updates of every site;
* both environment refreshes of batched_env_ab.AbEnvEngine — presweeps,
  device-looped GMRES restarts (replacing the staged engine's host-checked
  retries), interior fills, and passthrough stacking — warm-started from
  the previous iteration's regularized solutions, which ride the carry;
* the unit-cell energy and the gauge error, the only two scalars the host
  reads per iteration.

The per-channel environment dicts are NOT outputs of the iteration
program: the eigensolves consume the stacked layout directly, so XLA's
DCE drops every dict buffer that only existed to be restacked.  The final
``Environments`` object for the result is rebuilt once after convergence,
warm-started from the carried regularized solutions.

Exactness: every stage is the same traced computation the staged driver
dispatches (same kernels, same order, same tolerances semantics), pinned
by tests/test_fused_vumps.py against the staged path.  Opt out with
HTN_NO_FUSED=1.
"""

from __future__ import annotations

import os
import types
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..mps.imps import UniformMPS
from ..solvers.krylov import (_gmres_restart_core, _lanczos_restart_core,
                              full_blocks)
from ..tensor.symtensor import IN, OUT, SymTensor


def _lanczos_device(mv, v0, k: int, atol, max_restarts: int):
    """Smallest eigenpair via Lanczos with the restart loop ON DEVICE:
    identical semantics to solvers/krylov.lanczos_ground_plan (restart
    until the Ritz residual clears atol), zero host syncs."""
    th, v, res, _ = _lanczos_restart_core(mv, v0, k, atol=atol)

    def cond(c):
        r, th, v, res = c
        return (res >= atol) & (r < max_restarts)

    def body(c):
        r, th, v, res = c
        th2, v2, res2, _ = _lanczos_restart_core(mv, v, k, atol=atol)
        return r + 1, th2, v2, res2

    _, th, v, res = lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), th, v, res))
    return th, v, res


def _gmres_device(mv, x0, rhs, k: int, tol, max_restarts: int):
    """GMRES with the restart loop ON DEVICE: identical semantics to the
    staged engine's one-restart + host-checked retries (batched_env_ab
    .left/.right), zero host syncs."""
    bnorm = jnp.linalg.norm(rhs)
    atol = tol * bnorm
    x, res, _ = _gmres_restart_core(mv, x0, rhs, k, atol=atol)

    def cond(c):
        r, x, res = c
        return (res >= atol) & (r < max_restarts) & (bnorm > 0.0)

    def body(c):
        r, x, res = c
        x2, res2, _ = _gmres_restart_core(mv, x, rhs, k, atol=atol)
        return r + 1, x2, res2

    _, x, res = lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), x, res))
    return x, res


def _make_multi_step(step, chunk: int, rdt):
    """``chunk`` fused VUMPS iterations per dispatch: ``lax.scan`` over the
    iteration body with a converged passthrough (``lax.cond``), so a chunk
    only pays for the iterations it actually needs.  The carry is the full
    10-tuple the per-iteration ``step`` returns; per-slot (energy, error)
    ride out as scan outputs, so the host syncs ONCE per chunk instead of
    once per iteration (each sync is an RPC round trip on a tunneled
    device)."""

    def multi(ACs, Cs, ALs, ARs, E1, E2, yL, yR, err0, tol):
        def body(carry, _):
            def run(c):
                cACs, cCs, _, _, cE1, cE2, cyL, cyR, _, cerr = c
                return step(cACs, cCs, cE1, cE2, cyL, cyR, cerr, tol)

            carry2 = lax.cond(carry[-1] < tol, lambda c: c, run, carry)
            return carry2, (carry2[-2], carry2[-1])

        carry0 = (ACs, Cs, ALs, ARs, E1, E2, yL, yR,
                  jnp.zeros((), rdt), err0)
        return lax.scan(body, carry0, None, length=chunk)

    return multi


class FusedIterPlan:
    """One full VUMPS iteration as one jitted program, per (psi, H)
    block structure.  Requires the abelian batched stack: 2-leg W ops and
    a live AbEnvEngine (the caller falls back to the staged driver
    otherwise)."""

    def __init__(self, psi, H, eng, krylov_dim: int = 16,
                 max_restarts: int = 20, gmres_dim: int = 30,
                 use_polar: Optional[bool] = None, chunk: int = 1):
        from .batched_env_ab import AbEnvEngine  # noqa: F401 (type)
        from .batched_hac import PaddedHAC, PaddedHC
        from .environments import _zero_env_left, _zero_env_right

        T = psi.T
        g = psi.group
        dtype = psi.ALs[0].dtype
        self.T, self.group, self.dtype = T, g, dtype
        self.eng = eng
        self.k = krylov_dim
        self.max_restarts = max_restarts
        self.gmres_dim = gmres_dim
        self._rdt = jnp.real(jnp.zeros((), dtype)).dtype
        pm = eng.pm
        Cch = eng.lay_gl[0].Cch

        if use_polar is None:
            gauge_mode = os.environ.get("HTN_GAUGE", "auto")
            use_polar = (gauge_mode == "polar"
                         or (gauge_mode == "auto"
                             and jnp.dtype(dtype) == jnp.dtype(jnp.float32)))
        self.use_polar = use_polar

        self.plans_ac: List = []
        self.plans_c: List = []
        acs, cs = [], []
        for x in range(T):
            AC0 = full_blocks(psi.AC(x))
            C0 = full_blocks(psi.Cs[x])
            acs.append(AC0)
            cs.append(C0)
            VLx, VRx = AC0.spaces[0], AC0.spaces[2]
            GL3t = SymTensor.zeros(g, (VLx, VLx, pm.maps[x].space),
                                   (IN, OUT, IN), dtype=dtype, fill=False)
            GR3t = SymTensor.zeros(g, (VRx, VRx, pm.maps[(x + 1) % T].space),
                                   (IN, OUT, OUT), dtype=dtype, fill=False)
            GL13t = SymTensor.zeros(g, (VRx, VRx,
                                        pm.maps[(x + 1) % T].space),
                                    (IN, OUT, IN), dtype=dtype, fill=False)
            pa = PaddedHAC(GL3t, pm.Ws[x], GR3t, AC0, Cch=Cch)
            pc = PaddedHC(GL13t, GR3t, C0, Cch=Cch)
            if (pa.gl.pos != eng.lay_gl[x].stacks.pos
                    or pa.gr.pos != eng.lay_gr[x].stacks.pos
                    or pc.gl.pos != eng.lay_gl[(x + 1) % T].stacks.pos
                    or pc.gr.pos != eng.lay_gr[x].stacks.pos):
                raise ValueError("eigensolver-plan layout does not match "
                                 "the env engine's stacked layout")
            self.plans_ac.append(pa)
            self.plans_c.append(pc)

        if use_polar:
            from .batched_gauge import PolarGaugePlan
            self.gauge_plans = [PolarGaugePlan(acs[x], cs[(x - 1) % T],
                                               cs[x]) for x in range(T)]
        else:
            self.gauge_plans = None

        # warm-start templates: GL[fin] at bond 0, GR[0] at bond T-1
        self.fin = H.idx_final(0)
        self._gl_tmpl = _zero_env_left(
            g, psi.ALs[0].spaces[0], H.charges[0], dtype)[self.fin]
        self._gr_tmpl = _zero_env_right(
            g, psi.ARs[T - 1].spaces[2], H.charges[0], dtype)[0]

        raw = self._make_step()
        self._step = jax.jit(raw)
        self.chunk = max(1, int(chunk))
        self._multi = (jax.jit(_make_multi_step(raw, self.chunk, self._rdt))
                       if self.chunk > 1 else None)

    # ------------------------------------------------------------------
    def _gauge(self, x: int, AC, Cl, Cr):
        if self.use_polar:
            return self.gauge_plans[x].apply(AC, Cl, Cr)
        from .vumps import _gauge_site
        return _gauge_site(AC, Cl, Cr)

    def _make_step(self):
        from ..mps.imps import absorb_bond_right
        from .environments import rho_left, rho_right

        T, eng = self.T, self.eng
        k, R, gk = self.k, self.max_restarts, self.gmres_dim
        rdt = self._rdt

        def step(ACs, Cs, GLstk, GRstk, yL, yR, err_prev, tol):
            # inner eigensolve tolerance: staged driver's
            # max(min(1e-3, err * 1e-2), tol * 1e-2) on device
            inner = jnp.maximum(
                jnp.minimum(jnp.asarray(1e-3, rdt), err_prev * 1e-2),
                tol * 1e-2)
            ACs_new, Cs_new = [], []
            for x in range(T):
                pa, pc = self.plans_ac[x], self.plans_c[x]
                _, vac, _ = _lanczos_device(
                    lambda v, x=x, pa=pa: pa.matvec(v, GLstk[x], GRstk[x]),
                    pa.pack_vec(ACs[x]), k, inner, R)
                ACs_new.append(pa.unpack_vec(vac, ACs[x]))
                _, vc, _ = _lanczos_device(
                    lambda v, x=x, pc=pc: pc.matvec(
                        v, GLstk[(x + 1) % T], GRstk[x]),
                    pc.pack_vec(Cs[x]), k, inner, R)
                Cs_new.append(pc.unpack_vec(vc, Cs[x]))

            ALs, ARs = [], []
            err = jnp.zeros((), rdt)
            for x in range(T):
                AL, AR, dl, dr = self._gauge(x, ACs_new[x],
                                             Cs_new[(x - 1) % T], Cs_new[x])
                ALs.append(AL)
                ARs.append(AR)
                err = jnp.maximum(err, jnp.maximum(
                    jnp.asarray(dl, rdt), jnp.asarray(dr, rdt)))

            # env refresh tolerance: staged driver's
            # max(min(tol * 1e-2, err * 1e-3), 1e-14)
            env_tol = jnp.maximum(
                jnp.minimum(tol * 1e-2, err * 1e-3),
                jnp.asarray(1e-14, rdt))

            astL = eng.regL.pack_As(ALs)
            rhoT = eng.regL.layout.pack_transposed(rho_right(Cs_new[T - 1]))
            curL, rhsL, eL, trL, i0L = eng.raw["sweep_left"](astL, rhoT)
            yL2, _ = _gmres_device(
                lambda v: eng.raw["regL_mv"](v, astL, rhoT, i0L, trL),
                yL, rhsL, gk, env_tol, R)
            _GLs, GLstk2 = eng.raw["finalize_left"](curL, yL2, astL)

            astR = eng.regR.pack_As(ARs)
            sigT = eng.regR.layout.pack_transposed(rho_left(Cs_new[T - 1]))
            curR, rhsR, eR, trR, i0R = eng.raw["sweep_right"](astR, sigT)
            yR2, _ = _gmres_device(
                lambda v: eng.raw["regR_mv"](v, astR, sigT, i0R, trR),
                yR, rhsR, gk, env_tol, R)
            _GRs, GRstk2 = eng.raw["finalize_right"](curR, yR2, astR)

            # next iteration's eigensolves start from the gauge-projected
            # AC = AL . C, exactly like the staged driver's psi.AC(x)
            # (mps/imps.py:157) — NOT the raw Lanczos eigenvector
            ACs_carry = [absorb_bond_right(ALs[x], Cs_new[x])
                         for x in range(T)]
            e_cell = 0.5 * jnp.real(eL + eR)
            return (ACs_carry, Cs_new, ALs, ARs, GLstk2, GRstk2, yL2, yR2,
                    e_cell, err)

        return step

    # ------------------------------------------------------------------
    def init_carry(self, psi, envs):
        """(ACs, Cs, GL stacks, GR stacks, warm yL, warm yR) from a staged
        Environments of the same structure."""
        T = self.T
        ACs = [full_blocks(psi.AC(x)) for x in range(T)]
        Cs = [full_blocks(psi.Cs[x]) for x in range(T)]
        gl_fin = envs.GLs[0].get(self.fin)
        gr_ini = envs.GRs[T - 1].get(0)
        yL = (self.eng.regL.layout.pack(gl_fin) if gl_fin is not None
              else jnp.zeros((self.eng.regL.layout.total,), self.dtype))
        yR = (self.eng.regR.layout.pack(gr_ini) if gr_ini is not None
              else jnp.zeros((self.eng.regR.layout.total,), self.dtype))
        return ACs, Cs, envs.GL_stacks, envs.GR_stacks, yL, yR

    def step(self, ACs, Cs, GLstk, GRstk, yL, yR, err_prev, tol):
        # numpy scalars: host values the jit places with the carry (a
        # jnp scalar created under host_build would pin to the host)
        return self._step(ACs, Cs, GLstk, GRstk, yL, yR,
                          np.asarray(err_prev, self._rdt),
                          np.asarray(tol, self._rdt))

    def multi(self, ACs, Cs, ALs, ARs, GLstk, GRstk, yL, yR, err_prev, tol):
        """``chunk`` iterations in ONE dispatch; returns (carry, (es, errs))
        where the carry is the 10-tuple after the last non-converged slot
        and es/errs are the per-slot energy/gauge-error traces."""
        return self._multi(ACs, Cs, ALs, ARs, GLstk, GRstk, yL, yR,
                           np.asarray(err_prev, self._rdt),
                           np.asarray(tol, self._rdt))

    def final_envs_prev(self, yL, yR):
        """Shim ``prev`` for the result's Environments rebuild: the carried
        regularized solutions ARE the final GL[fin] / GR[0] warm starts."""
        gl_fin = self.eng.regL.layout.unpack(yL, self._gl_tmpl)
        gr_ini = self.eng.regR.layout.unpack(yR, self._gr_tmpl)
        GLs = [dict() for _ in range(self.T)]
        GRs = [dict() for _ in range(self.T)]
        GLs[0][self.fin] = gl_fin
        GRs[self.T - 1][0] = gr_ini
        return types.SimpleNamespace(GLs=GLs, GRs=GRs)


_PLAN_CACHE: Dict = {}
_PLAN_CACHE_MAX = 4


def _plan_for(psi, H, eng, krylov_dim: int,
              chunk: int) -> Optional[FusedIterPlan]:
    key = (id(H), id(eng), krylov_dim, chunk,
           tuple(a.structure() for a in psi.ALs),
           tuple(c.structure() for c in psi.Cs),
           str(psi.ALs[0].dtype), os.environ.get("HTN_GAUGE", "auto"))
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0] is H and hit[1] is eng:
        return hit[2]
    try:
        plan = FusedIterPlan(psi, H, eng, krylov_dim=krylov_dim, chunk=chunk)
    except ValueError:
        return None
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = (H, eng, plan)
    return plan


def vumps_fused_loop(psi, H, envs, tol: float, maxiter: int,
                     krylov_dim: int, verbosity: int):
    """Run the VUMPS iteration loop through the fused whole-iteration
    program: HTN_FUSED_CHUNK iterations (default 4) per dispatch with ONE
    scalar host sync per chunk (converged slots pass through for free).

    Returns (psi, envs, energy, err, history, converged), or None when the
    structure is not servable (the caller keeps the staged loop)."""
    import time

    from ..utils.device import to_accel, to_host
    from .environments import Environments

    if envs.ab_engine is None or envs.GL_stacks is None:
        return None
    from ..utils.device import accel_device
    if accel_device() is None and psi.T >= 4:
        # image bug: XLA CPU segfaults compiling the 4-site (multi-band
        # strip) fused step (heap corruption, crash site wanders; see
        # CLAUDE.md).  The fused program exists for the tunneled chip;
        # the staged loop serves CPU runs of these models.
        return None
    chunk = max(1, int(os.environ.get("HTN_FUSED_CHUNK", "4")))
    plan = _plan_for(psi, H, envs.ab_engine, krylov_dim, chunk)
    if plan is None:
        return None

    T = psi.T
    ACs, Cs, GLstk, GRstk, yL, yR = plan.init_carry(psi, envs)
    err = np.inf
    energy = float(jnp.real(envs.energy_per_site))
    history: List[dict] = []
    converged = False
    # full allowed-block tables: the multi-iteration scan's
    # converged passthrough (lax.cond) requires the carried
    # ALs/ARs to have the same pytree as the step outputs, and
    # expansion points hand in states with partial tables
    ALs = [full_blocks(t) for t in psi.ALs]
    ARs = [full_blocks(t) for t in psi.ARs]
    # ship the carry to the accelerator ONCE; every iteration after runs
    # on committed device arrays (the host only reads two scalars)
    (ACs, Cs, GLstk, GRstk, yL, yR, ALs, ARs) = to_accel(
        (ACs, Cs, GLstk, GRstk, yL, yR, ALs, ARs))
    it = 0
    while it < maxiter and not converged:
        t0 = time.perf_counter()
        if plan._multi is not None and maxiter - it >= chunk:
            carry, (es, errs) = plan.multi(ACs, Cs, ALs, ARs, GLstk, GRstk,
                                           yL, yR, err, tol)
            (ACs, Cs, ALs, ARs, GLstk, GRstk, yL, yR, _, _) = carry
            es = np.asarray(es)      # the chunk's single host sync
            errs = np.asarray(errs)
            ms = (time.perf_counter() - t0) * 1e3
            for j in range(chunk):
                err = float(errs[j])
                energy = float(es[j]) / T
                history.append({"iter": it, "energy": energy, "error": err,
                                "stage_ms": {"fused": ms / chunk}})
                if verbosity >= 2:
                    print(f"[vumps/fused] iter={it:3d}  e={energy:+.12f}  "
                          f"err={err:.3e}")
                it += 1
                if err < tol:
                    converged = True
                    break
        else:
            (ACs, Cs, ALs, ARs, GLstk, GRstk, yL, yR, e_cell,
             err_dev) = plan.step(ACs, Cs, GLstk, GRstk, yL, yR, err, tol)
            err = float(err_dev)     # the iteration's single host sync
            energy = float(e_cell) / T
            history.append({"iter": it, "energy": energy, "error": err,
                            "stage_ms": {"fused": (time.perf_counter() - t0)
                                         * 1e3}})
            if verbosity >= 2:
                print(f"[vumps/fused] iter={it:3d}  e={energy:+.12f}  "
                      f"err={err:.3e}")
            it += 1
            if err < tol:
                converged = True

    # the eager structure layer above (expansion, excitations, gauging)
    # lives on the host; pull the converged state back once
    ALs, ARs, Cs, yL, yR = to_host((ALs, ARs, Cs, yL, yR))
    psi_out = UniformMPS(ALs, ARs, Cs)
    envs_out = Environments(psi_out, H,
                            tol=max(min(tol * 1e-2, err * 1e-3), 1e-14),
                            prev=plan.final_envs_prev(yL, yR))
    energy = float(jnp.real(envs_out.energy_per_site))
    return psi_out, envs_out, energy, err, history, converged
