"""Whole-iteration fused VUMPS for the SU(2) fusion-tree backend.

SU(2) counterpart of algorithms/fused_vumps.py: ONE jitted program per
VUMPS iteration (reference behavior: one iteration of MPSKit's VUMPS
loop, /root/reference/src/HubbardFunctions.jl:1012,1017,1025, under the
reference's *default* fZ2 x SU(2) x U(1) symmetry,
/root/reference/src/HubbardFunctions.jl:245-255):

* all T sites' H_AC / H_C ground-state solves as device
  ``lax.while_loop`` restart loops around the early-exiting Lanczos core
  on the bucketed batched fusion matvecs (batched_fusion.PaddedHACSU2 /
  PaddedHCSU2), with the channel-stacked environments packed from the
  carried per-channel dicts INSIDE the trace (the staged driver's
  eager repack round trip disappears);
* the bucketed polar (f32) or exact per-block QR (f64) gauge updates;
* both environment refreshes of batched_env_su2.SU2EnvEngine —
  presweeps, device-looped GMRES restarts, interior fills — warm-started
  from the previous iteration's regularized solutions riding the carry.

Like the abelian plan, the carry holds the eigensolver plans' PACKED
environment stacks (a few large bucketed arrays per site), not the
per-channel dicts: the dict -> channel-stack -> bucket gathers run at
the BOTTOM of each iteration, fused with the env fills that produce
them, so the hundreds of small per-channel buffers never cross the
program boundary (carrying dicts measured ~1.2 ms/iter slower at dense
chi~2874 than the staged stage sum; stacked carry removes both the
boundary materialization and the top-of-step repack).  The host reads
two scalars per iteration (energy, gauge error).  Exactness is pinned
by tests/test_fused_vumps.py (SU(2) cases) against the staged driver.
Opt out with HTN_NO_FUSED=1.
"""

from __future__ import annotations

import os
import types
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..mps.imps import UniformMPS, absorb_bond_right
from ..solvers.krylov import full_blocks
from ..tensor.fusion import append_trivial_leg
from ..tensor.symtensor import IN, OUT
from .fused_vumps import _gmres_device, _lanczos_device, _make_multi_step


class FusedIterPlanSU2:
    """One full SU(2) VUMPS iteration as one jitted program, per
    (psi, H, env) block structure.  Requires the channel-stacked MPO
    (mpo/su2_pack.py) and a live SU2EnvEngine."""

    def __init__(self, psi, H, eng, envs, krylov_dim: int = 16,
                 max_restarts: int = 20, gmres_dim: int = 30,
                 use_polar: Optional[bool] = None, chunk: int = 1):
        import jax

        from ..mpo.su2_pack import PackedMPOSU2
        from .batched_fusion import PaddedHACSU2, PaddedHCSU2
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
        self.pm2 = PackedMPOSU2(H)
        pm2 = self.pm2

        if use_polar is None:
            gauge_mode = os.environ.get("HTN_GAUGE", "auto")
            use_polar = (gauge_mode == "polar"
                         or (gauge_mode == "auto"
                             and jnp.dtype(dtype) == jnp.dtype(jnp.float32)))
        self.use_polar = use_polar

        # eigensolver plans from the staged environments' (stable) channel
        # structure; per-iteration packing happens inside the trace
        self.plans_ac: List = []
        self.plans_c: List = []
        acs, cs = [], []
        for x in range(T):
            AC0 = full_blocks(psi.AC(x))
            C0 = full_blocks(psi.Cs[x])
            acs.append(AC0)
            cs.append(C0)
            GL3 = pm2.pack_env_left(envs.GLs[x], x)
            GR3 = pm2.pack_env_right(envs.GRs[x], (x + 1) % T)
            GL13 = pm2.pack_env_left(envs.GLs[(x + 1) % T], (x + 1) % T)
            self.plans_ac.append(PaddedHACSU2(GL3, pm2.Ws[x], GR3, AC0))
            self.plans_c.append(PaddedHCSU2(GL13, GR3, C0))

        if use_polar:
            from .batched_gauge_su2 import PolarGaugePlanSU2
            self.gauge_plans = [PolarGaugePlanSU2(acs[x], cs[(x - 1) % T],
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
        self._pack_envs = jax.jit(self._pack_all)

    # ------------------------------------------------------------------
    def _pack_all(self, GLs, GRs):
        """Per-site packed env stacks for the eigensolver plans:
        per-channel dicts -> channel-stacked 3-leg -> bucketed stacks.
        EL[x] = (H_AC's GL @ bond x, H_C's GL @ bond x+1); ER[x] packs the
        shared GR @ bond x once per plan layout."""
        T, pm2 = self.T, self.pm2
        EL, ER = [], []
        for x in range(T):
            pa, pc = self.plans_ac[x], self.plans_c[x]
            GL3 = pm2.pack_env_left(GLs[x], x)
            GR3 = pm2.pack_env_right(GRs[x], (x + 1) % T)
            GL13 = pm2.pack_env_left(GLs[(x + 1) % T], (x + 1) % T)
            EL.append((pa.pack_gl(GL3), pc.pack_gl(GL13)))
            ER.append((pa.pack_gr(GR3), pc.pack_gr(GR3)))
        return EL, ER

    def _gauge(self, x: int, AC, Cl, Cr):
        if self.use_polar:
            return self.gauge_plans[x].apply(AC, Cl, Cr)
        from .vumps import _gauge_site
        return _gauge_site(AC, Cl, Cr)

    def _make_step(self):
        from .environments import rho_left, rho_right

        T, eng = self.T, self.eng
        k, R, gk = self.k, self.max_restarts, self.gmres_dim
        rdt = self._rdt

        def step(ACs, Cs, EL, ER, yL, yR, err_prev, tol):
            # inner eigensolve tolerance: staged driver's
            # max(min(1e-3, err * 1e-2), tol * 1e-2) on device
            inner = jnp.maximum(
                jnp.minimum(jnp.asarray(1e-3, rdt), err_prev * 1e-2),
                tol * 1e-2)
            ACs_new, Cs_new = [], []
            for x in range(T):
                pa, pc = self.plans_ac[x], self.plans_c[x]
                GLp, GL1p = EL[x]
                GRp, GR1p = ER[x]
                _, vac, _ = _lanczos_device(
                    lambda v, pa=pa, GLp=GLp, GRp=GRp:
                        pa.matvec(v, GLp, GRp),
                    pa.pack_vec(ACs[x]), k, inner, R)
                ACs_new.append(pa.unpack_vec(vac, ACs[x]))
                _, vc, _ = _lanczos_device(
                    lambda v, pc=pc, GL1p=GL1p, GR1p=GR1p:
                        pc.matvec(v, GL1p, GR1p),
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

            ALt = tuple(ALs)
            rho_arrays = eng.pairL.pack_r(
                append_trivial_leg(rho_right(Cs_new[T - 1]), OUT))
            curL, rhsL, eL, trL, i0L = eng.raw["sweep_left"](ALt, rho_arrays)
            a_abL = eng.raw["pack_abL"](ALt)
            yL2, _ = _gmres_device(
                lambda v: eng.raw["regL_mv"](v, a_abL, rho_arrays, i0L,
                                             trL),
                yL, rhsL, gk, env_tol, R)
            GLs2 = eng.raw["finalize_left"](curL, yL2, ALt)

            ARt = tuple(ARs)
            sig_arrays = eng.pairR.pack_r(
                append_trivial_leg(rho_left(Cs_new[T - 1]), IN))
            curR, rhsR, eR, trR, i0R = eng.raw["sweep_right"](ARt,
                                                              sig_arrays)
            a_abR = eng.raw["pack_abR"](ARt)
            yR2, _ = _gmres_device(
                lambda v: eng.raw["regR_mv"](v, a_abR, sig_arrays, i0R,
                                             trR),
                yR, rhsR, gk, env_tol, R)
            GRs2 = eng.raw["finalize_right"](curR, yR2, ARt)

            # next iteration's eigensolves start from the gauge-projected
            # AC = AL . C, exactly like the staged driver's psi.AC(x)
            ACs_carry = [absorb_bond_right(ALs[x], Cs_new[x])
                         for x in range(T)]
            # pack the refreshed envs HERE (fused with the fills above):
            # the carry holds the plans' stacked layout, so the per-channel
            # dict buffers never materialize at the program boundary
            EL2, ER2 = self._pack_all(GLs2, GRs2)
            e_cell = 0.5 * jnp.real(eL + eR)
            return (ACs_carry, Cs_new, ALs, ARs, EL2, ER2, yL2, yR2,
                    e_cell, err)

        return step

    # ------------------------------------------------------------------
    def init_carry(self, psi, envs):
        T = self.T
        ACs = [full_blocks(psi.AC(x)) for x in range(T)]
        Cs = [full_blocks(psi.Cs[x]) for x in range(T)]
        gl_fin = envs.GLs[0].get(self.fin)
        gr_ini = envs.GRs[T - 1].get(0)
        yL = (self.eng.xlayL[0].pack_vec(gl_fin) if gl_fin is not None
              else jnp.zeros((self.eng.xlayL[0].total,), self.dtype))
        yR = (self.eng.xlayR[T - 1].pack_vec(gr_ini) if gr_ini is not None
              else jnp.zeros((self.eng.xlayR[T - 1].total,), self.dtype))
        EL, ER = self._pack_envs(list(envs.GLs), list(envs.GRs))
        return ACs, Cs, EL, ER, yL, yR

    def step(self, ACs, Cs, EL, ER, yL, yR, err_prev, tol):
        # numpy scalars: host values the jit places with the carry
        return self._step(ACs, Cs, EL, ER, yL, yR,
                          np.asarray(err_prev, self._rdt),
                          np.asarray(tol, self._rdt))

    def multi(self, ACs, Cs, ALs, ARs, EL, ER, yL, yR, err_prev, tol):
        """``chunk`` iterations in ONE dispatch (see fused_vumps
        ._make_multi_step); returns (carry, (es, errs))."""
        return self._multi(ACs, Cs, ALs, ARs, EL, ER, yL, yR,
                           np.asarray(err_prev, self._rdt),
                           np.asarray(tol, self._rdt))

    def final_envs_prev(self, yL, yR):
        """Shim ``prev`` for the result's Environments rebuild: the carried
        regularized solutions ARE the final GL[fin] / GR[0] warm starts."""
        gl_fin = self.eng.xlayL[0].unpack(yL, self._gl_tmpl)
        gr_ini = self.eng.xlayR[self.T - 1].unpack(yR, self._gr_tmpl)
        GLs = [dict() for _ in range(self.T)]
        GRs = [dict() for _ in range(self.T)]
        GLs[0][self.fin] = gl_fin
        GRs[self.T - 1][0] = gr_ini
        return types.SimpleNamespace(GLs=GLs, GRs=GRs)


_PLAN_CACHE: Dict = {}
_PLAN_CACHE_MAX = 4


def _plan_for(psi, H, eng, envs, krylov_dim: int,
              chunk: int) -> Optional[FusedIterPlanSU2]:
    key = (id(H), id(eng), krylov_dim, chunk,
           tuple(a.structure() for a in psi.ALs),
           tuple(c.structure() for c in psi.Cs),
           str(psi.ALs[0].dtype), os.environ.get("HTN_GAUGE", "auto"))
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0] is H and hit[1] is eng:
        return hit[2]
    plan = FusedIterPlanSU2(psi, H, eng, envs, krylov_dim=krylov_dim,
                            chunk=chunk)
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = (H, eng, plan)
    return plan


def vumps_fused_loop_su2(psi, H, envs, tol: float, maxiter: int,
                         krylov_dim: int, verbosity: int):
    """Run the SU(2) VUMPS iteration loop through the fused
    whole-iteration program: ONE dispatch and ONE scalar host sync per
    iteration.  Returns (psi, envs, energy, err, history, converged), or
    None when the structure is not servable (caller keeps the staged
    loop)."""
    import time

    from .batched_env_su2 import SU2EnvEngine
    from .environments import Environments

    if (not getattr(psi.group, "has_su2", False)
            or os.environ.get("HTN_NO_SU2_ENV_PACK", "") == "1"
            or not all(op.ndim == 4 for W in H.Ws for op in W.values())):
        return None
    eng = SU2EnvEngine.get(psi, H)
    if not hasattr(eng, "raw"):
        return None
    from ..utils.device import accel_device
    if accel_device() is None and psi.T >= 4:
        # image bug: XLA CPU segfaults compiling the 4-site (multi-band
        # strip) fused step (heap corruption, crash site wanders; see
        # CLAUDE.md).  The fused program exists for the tunneled chip;
        # the staged loop serves CPU runs of these models.
        return None
    chunk = max(1, int(os.environ.get("HTN_FUSED_CHUNK", "4")))
    plan = _plan_for(psi, H, eng, envs, krylov_dim, chunk)

    from ..utils.device import to_accel, to_host

    T = psi.T
    ACs, Cs, EL, ER, yL, yR = plan.init_carry(psi, envs)
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
    # ship the carry to the accelerator ONCE (see fused_vumps.py)
    (ACs, Cs, EL, ER, yL, yR, ALs, ARs) = to_accel(
        (ACs, Cs, EL, ER, yL, yR, ALs, ARs))
    it = 0
    while it < maxiter and not converged:
        t0 = time.perf_counter()
        if plan._multi is not None and maxiter - it >= chunk:
            carry, (es, errs) = plan.multi(ACs, Cs, ALs, ARs, EL, ER,
                                           yL, yR, err, tol)
            (ACs, Cs, ALs, ARs, EL, ER, yL, yR, _, _) = carry
            es = np.asarray(es)      # the chunk's single host sync
            errs = np.asarray(errs)
            ms = (time.perf_counter() - t0) * 1e3
            for j in range(chunk):
                err = float(errs[j])
                energy = float(es[j]) / T
                history.append({"iter": it, "energy": energy, "error": err,
                                "stage_ms": {"fused": ms / chunk}})
                if verbosity >= 2:
                    print(f"[vumps/fused-su2] iter={it:3d}  "
                          f"e={energy:+.12f}  err={err:.3e}")
                it += 1
                if err < tol:
                    converged = True
                    break
        else:
            (ACs, Cs, ALs, ARs, EL, ER, yL, yR, e_cell,
             err_dev) = plan.step(ACs, Cs, EL, ER, yL, yR, err, tol)
            err = float(err_dev)     # the iteration's single host sync
            energy = float(e_cell) / T
            history.append({"iter": it, "energy": energy, "error": err,
                            "stage_ms": {"fused": (time.perf_counter() - t0)
                                         * 1e3}})
            if verbosity >= 2:
                print(f"[vumps/fused-su2] iter={it:3d}  e={energy:+.12f}  "
                      f"err={err:.3e}")
            it += 1
            if err < tol:
                converged = True

    ALs, ARs, Cs, yL, yR = to_host((ALs, ARs, Cs, yL, yR))
    psi_out = UniformMPS(ALs, ARs, Cs)
    envs_out = Environments(psi_out, H,
                            tol=max(min(tol * 1e-2, err * 1e-3), 1e-14),
                            prev=plan.final_envs_prev(yL, yR))
    energy = float(jnp.real(envs_out.energy_per_site))
    return psi_out, envs_out, energy, err, history, converged
