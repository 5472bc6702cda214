"""VUMPS ground-state solver for uniform MPS.

TPU-native equivalent of MPSKit's ``find_groundstate(psi, H, VUMPS(...))``
(reference call sites /root/reference/src/HubbardFunctions.jl:1012,1017,1025).

Per iteration: solve the smallest eigenpair of the effective Hamiltonians
H_AC (per site) and H_C (per bond) with packed Lanczos, then recover the
isometric AL/AR via the QR-based gauge update AL = Q(AC) Q(C)^dag.  All
block tables stay fixed across iterations, so every matvec hits the same
jitted XLA program of batched ``dot_general`` — the XLA-friendly property
the survey's build plan calls for (SURVEY.md section 7.6)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS, absorb_bond_left, absorb_bond_right
from ..solvers.krylov import (Packer, full_blocks, lanczos_ground,
                              lanczos_ground_plan)
from ..tensor import linalg as tla
from ..tensor.symtensor import SymTensor, tensordot
from .environments import Environments


def apply_H_AC(GL: Dict[int, SymTensor], W, GR: Dict[int, SymTensor],
               AC: SymTensor) -> SymTensor:
    """Effective one-site Hamiltonian: sum over FSM transitions (a,b) of
    GL[a] . W[(a,b)] . AC . GR[b].

    SU(2) path (4-leg W with explicit channel legs; GL = (bra IN, ket OUT,
    ch IN), GR = (ket IN, bra OUT, ch OUT)) dispatches on op.ndim."""
    out: Optional[SymTensor] = None
    for (a, b), op in W.items():
        X = GL.get(a)
        R = GR.get(b)
        if X is None or R is None or not X.blocks or not R.blocks:
            continue
        if op.ndim == 4:
            Y = tensordot(X, AC, axes=([1], [0]))     # (bra, ch, p, vr)
            Y = tensordot(op, Y, axes=([0, 2], [1, 2]))  # (p_out, chb, bra, vr)
            Y = tensordot(Y, R, axes=([3, 1], [0, 2]))   # (p_out, bra_l, bra_r)
        else:
            Y = tensordot(X, AC, axes=([1], [0]))        # (bra_l, p, r)
            Y = tensordot(op, Y, axes=([1], [1]))        # (p_out, bra_l, r)
            Y = tensordot(Y, R, axes=([2], [0]))         # (p_out, bra_l, bra_r)
        Y = Y.transpose((1, 0, 2))                   # (bra_l, p_out, bra_r)
        out = Y if out is None else out + Y
    return out if out is not None else AC * 0.0


def apply_H_C(GL: Dict[int, SymTensor], GR: Dict[int, SymTensor],
              C: SymTensor) -> SymTensor:
    """Effective zero-site Hamiltonian: sum over channels a of
    GL[a] . C . GR[a]  (GL at the bond left of site x+1, GR right of x)."""
    out: Optional[SymTensor] = None
    for a, X in GL.items():
        R = GR.get(a)
        if R is None or not X.blocks or not R.blocks:
            continue
        if X.ndim == 3:
            Y = tensordot(X, C, axes=([1], [0]))     # (bra_l, ch, r)
            Y = tensordot(Y, R, axes=([2, 1], [0, 2]))  # (bra_l, bra_r)
        else:
            Y = tensordot(X, C, axes=([1], [0]))         # (bra_l, r)
            Y = tensordot(Y, R, axes=([1], [0]))         # (bra_l, bra_r)
        out = Y if out is None else out + Y
    return out if out is not None else C * 0.0


def apply_H_AC2(GL: Dict[int, SymTensor], W0, W1, GR: Dict[int, SymTensor],
                AC2: SymTensor) -> SymTensor:
    """Effective two-site Hamiltonian: sum over FSM paths a -> c -> b of
    GL[a] . W0[(a,c)] . W1[(c,b)] . AC2 . GR[b].  AC2 legs (vl, p0, p1, vr)."""
    # group W1 transitions by middle channel for the path sum
    by_mid: Dict[int, list] = {}
    for (c, b), op1 in W1.items():
        by_mid.setdefault(c, []).append((b, op1))
    out: Optional[SymTensor] = None
    for (a, c), op0 in W0.items():
        X = GL.get(a)
        if X is None or not X.blocks:
            continue
        for b, op1 in by_mid.get(c, ()):
            R = GR.get(b)
            if R is None or not R.blocks:
                continue
            if op0.ndim == 4:
                Y = tensordot(X, AC2, axes=([1], [0]))   # (bra, ch, p0, p1, vr)
                Y = tensordot(op0, Y, axes=([0, 2], [1, 2]))
                # (q0, chm, bra, p1, vr)
                Y = tensordot(op1, Y, axes=([0, 2], [1, 3]))
                # (q1, chb, q0, bra, vr)
                Y = tensordot(Y, R, axes=([4, 1], [0, 2]))
                # (q1, q0, bra_l, bra_r)
            else:
                Y = tensordot(X, AC2, axes=([1], [0]))    # (bra_l, p0, p1, r)
                Y = tensordot(op0, Y, axes=([1], [1]))    # (q0, bra_l, p1, r)
                Y = tensordot(op1, Y, axes=([1], [2]))    # (q1, q0, bra_l, r)
                Y = tensordot(Y, R, axes=([3], [0]))      # (q1, q0, bra_l, bra_r)
            Y = Y.transpose((2, 1, 0, 3))             # (bra_l, q0, q1, bra_r)
            out = Y if out is None else out + Y
    return out if out is not None else AC2 * 0.0


@partial(jax.jit, static_argnames=("packer",))
def _h_ac2_packed(vec, GL, W0, W1, GR, *, packer: Packer):
    return packer.pack(apply_H_AC2(GL, W0, W1, GR, packer.unpack(vec)))


@partial(jax.jit, static_argnames=("packer",))
def _h_ac_packed(vec, GL, W, GR, *, packer: Packer):
    return packer.pack(apply_H_AC(GL, W, GR, packer.unpack(vec)))


@partial(jax.jit, static_argnames=("packer",))
def _h_c_packed(vec, GL, GR, *, packer: Packer):
    return packer.pack(apply_H_C(GL, GR, packer.unpack(vec)))


@partial(jax.jit, static_argnames=("plan",))
def _hac_batched_mv(vec, GLp, GRp, *, plan):
    return plan.matvec(vec, GLp, GRp)


@partial(jax.jit, static_argnames=("plan",))
def _hc_batched_mv(vec, GLp, GRp, *, plan):
    return plan.matvec(vec, GLp, GRp)


class _DictHACPlan:
    """Hashable matvec plan for the per-channel dict path (SU(2) backend
    and any structure the bucketed kernels don't cover): lets the fully-
    jitted Lanczos restarts of solvers/krylov drive apply_H_AC too."""

    __slots__ = ("packer",)

    def __init__(self, packer: Packer):
        self.packer = packer

    def matvec(self, v, GL, W, GR):
        return self.packer.pack(apply_H_AC(GL, W, GR, self.packer.unpack(v)))

    def __hash__(self):
        return hash(("dictHAC", self.packer))

    def __eq__(self, other):
        return isinstance(other, _DictHACPlan) and self.packer == other.packer


class _DictHCPlan:
    __slots__ = ("packer",)

    def __init__(self, packer: Packer):
        self.packer = packer

    def matvec(self, v, GL, GR):
        return self.packer.pack(apply_H_C(GL, GR, self.packer.unpack(v)))

    def __hash__(self):
        return hash(("dictHC", self.packer))

    def __eq__(self, other):
        return isinstance(other, _DictHCPlan) and self.packer == other.packer


class _BatchedSiteSU2:
    """SU(2) counterpart of :class:`_BatchedSite`: channel-stacks the env
    dicts (mpo/su2_pack.py) and runs the bucketed batched fusion matvecs of
    algorithms/batched_fusion.py inside the Lanczos loops."""

    def __init__(self, H, pm2, x: int, psi):
        self.pm2, self.x, self.T = pm2, x, psi.T
        self.plan_ac = None
        self.plan_c = None
        self._struct = None

    def ensure(self, GLx, GRx, GLx1, AC, C):
        from .batched_fusion import PaddedHACSU2, PaddedHCSU2
        pm2, x, T = self.pm2, self.x, self.T
        GL3 = pm2.pack_env_left(GLx, x)
        GR3 = pm2.pack_env_right(GRx, (x + 1) % T)
        GL13 = pm2.pack_env_left(GLx1, (x + 1) % T)
        if self.plan_ac is None or self._struct != (
                GL3.structure(), GR3.structure(), AC.structure(),
                C.structure()):
            self.plan_ac = PaddedHACSU2(GL3, pm2.Ws[x], GR3, AC)
            self.plan_c = PaddedHCSU2(GL13, GR3, C)
            self._struct = (GL3.structure(), GR3.structure(),
                            AC.structure(), C.structure())
        return (self.plan_ac.pack_gl(GL3), self.plan_ac.pack_gr(GR3),
                self.plan_c.pack_gl(GL13), self.plan_c.pack_gr(GR3))


class _BatchedSite:
    """Per-site bucketed solvers (built once per block structure): packs the
    channel dicts into stacked class arrays and runs the batched matvecs of
    algorithms/batched_hac.py inside the Lanczos loops.

    When the environments came from the batched abelian engine
    (algorithms/batched_env_ab.py), its per-bond stacked arrays feed the
    plans directly — the plans are built on the engine's layouts (same
    templates, same global channel pad), so the dict -> host -> stacks
    repack round trip disappears from the iteration."""

    def __init__(self, H, pm, x: int, psi):
        self.pm, self.x, self.T = pm, x, psi.T
        self.plan_ac = None
        self.plan_c = None
        self._struct = None

    def ensure(self, GLx, GRx, GLx1, AC, C, envs=None):
        from ..tensor.symtensor import IN, OUT
        from .batched_hac import PaddedHAC, PaddedHC
        pm, x, T = self.pm, self.x, self.T
        eng = getattr(envs, "ab_engine", None)
        if eng is not None and getattr(envs, "GL_stacks", None) is not None:
            key = ("eng", id(eng), AC.structure(), C.structure())
            if self._struct != key:
                g = AC.group
                VLx, VRx = AC.spaces[0], AC.spaces[2]
                GL3t = SymTensor.zeros(g, (VLx, VLx, pm.maps[x].space),
                                       (IN, OUT, IN), dtype=AC.dtype,
                                       fill=False)
                GR3t = SymTensor.zeros(
                    g, (VRx, VRx, pm.maps[(x + 1) % T].space),
                    (IN, OUT, OUT), dtype=AC.dtype, fill=False)
                GL13t = SymTensor.zeros(
                    g, (VRx, VRx, pm.maps[(x + 1) % T].space),
                    (IN, OUT, IN), dtype=AC.dtype, fill=False)
                Cch = eng.lay_gl[x].Cch
                plan_ac = PaddedHAC(GL3t, pm.Ws[x], GR3t, AC, Cch=Cch)
                plan_c = PaddedHC(GL13t, GR3t, C, Cch=Cch)
                if (plan_ac.gl.pos == eng.lay_gl[x].stacks.pos
                        and plan_ac.gr.pos == eng.lay_gr[x].stacks.pos
                        and plan_c.gl.pos
                        == eng.lay_gl[(x + 1) % T].stacks.pos
                        and plan_c.gr.pos == eng.lay_gr[x].stacks.pos):
                    self.plan_ac, self.plan_c = plan_ac, plan_c
                    self._struct = key
                else:  # layout drift (unexpected): dict repack below
                    self.plan_ac = None
                    self._struct = None
            if self._struct == key:
                return (envs.GL_stacks[x], envs.GR_stacks[x],
                        envs.GL_stacks[(x + 1) % T], envs.GR_stacks[x])
        GL3 = pm.pack_env_left(GLx, x)
        GR3 = pm.pack_env_right(GRx, (x + 1) % T)
        GL13 = pm.pack_env_left(GLx1, (x + 1) % T)
        if self.plan_ac is None or self._struct != (
                GL3.structure(), GR3.structure(), AC.structure(),
                C.structure()):
            self.plan_ac = PaddedHAC(GL3, pm.Ws[x], GR3, AC)
            self.plan_c = PaddedHC(GL13, GR3, C)
            self._struct = (GL3.structure(), GR3.structure(),
                            AC.structure(), C.structure())
        return (self.plan_ac.pack_gl(GL3), self.plan_ac.pack_gr(GR3),
                self.plan_c.pack_gl(GL13), self.plan_c.pack_gr(GR3))


@jax.jit
def gauge_from_AC_C(AC: SymTensor, C_left: SymTensor, C_right: SymTensor):
    """Recover isometric (AL, AR) from the updated AC and bond matrices via
    the positive-QR polar trick: AL = Q(AC|2) Q(C_right|1)^dag and the LQ
    mirror for AR."""
    QAC, _ = tla.qr(AC, 2)
    QC, _ = tla.qr(C_right, 1)
    AL = tensordot(QAC, QC.conj(), axes=([2], [1]))      # (vl, p, l_C)

    _, QAC_r = tla.lq(AC, 1)
    _, QC_l = tla.lq(C_left, 1)
    AR = tensordot(QC_l.conj(), QAC_r, axes=([0], [0]))  # (r_C, p, vr)
    return AL, AR


@jax.jit
def _gauge_site(AC: SymTensor, C_left: SymTensor, C_right: SymTensor):
    """Gauge update + gauge-error norms for one site, fused in one program."""
    AL, AR = gauge_from_AC_C(AC, C_left, C_right)
    dl = (AC - absorb_bond_right(AL, C_right)).norm()
    dr = (AC - absorb_bond_left(C_left, AR)).norm()
    return AL, AR, dl, dr


@dataclass
class VUMPSResult:
    psi: UniformMPS
    envs: Environments
    energy: float          # per site
    error: float           # gauge/galerkin error
    iterations: int
    converged: bool
    history: List[dict]


from ..utils.device import host_built
from ..utils.profiling import profiled


@host_built
@profiled("vumps")
def vumps(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-8,
          maxiter: int = 200, krylov_dim: int = 16, verbosity: int = 0,
          envs: Environments = None) -> VUMPSResult:
    """Variational uniform MPS ground-state optimization."""
    T = psi.T
    history: List[dict] = []
    err = np.inf
    envs = Environments(psi, H, tol=max(tol * 1e-2, 1e-14), prev=envs)
    energy = float(jnp.real(envs.energy_per_site))
    converged = False
    # block structures are fixed across iterations: build packers once
    pk_acs = [Packer(full_blocks(psi.AC(x))) for x in range(T)]
    pk_cs = [Packer(full_blocks(psi.Cs[x])) for x in range(T)]
    # batched (channel-packed, shape-bucketed) inner solves for abelian MPOs
    # (any physical-sector multiplicity, incl. the grand site's 2-dim
    # trivial sector; the SU(2) fusion-tree backend keeps the dict path)
    import os as _os
    use_batched = (
        _os.environ.get("HTN_NO_BATCHED", "") != "1"
        and all(op.ndim == 2 for W in H.Ws for op in W.values()))
    if use_batched:
        from ..mpo.channel_pack import PackedMPO
        pm = PackedMPO(H)
        bsites = [_BatchedSite(H, pm, x, psi) for x in range(T)]
    # whole-iteration fusion: when the abelian batched engine serves this
    # structure, run the loop as ONE jitted program per iteration (all
    # eigensolves + gauges + both env refreshes; a single scalar host sync)
    if use_batched and _os.environ.get("HTN_NO_FUSED", "") != "1":
        from .fused_vumps import vumps_fused_loop
        fused = vumps_fused_loop(psi, H, envs, tol, maxiter, krylov_dim,
                                 verbosity)
        if fused is not None:
            psi_f, envs_f, energy_f, err_f, history_f, conv_f = fused
            if verbosity >= 1:
                print(f"[vumps] done: e={energy_f:+.12f} err={err_f:.3e} "
                      f"iters={len(history_f)}")
            return VUMPSResult(psi_f, envs_f, energy_f, float(err_f),
                               len(history_f), conv_f, history_f)
    # SU(2): stack equal-charge channels onto one channel leg
    # (mpo/su2_pack.py) and run the inner solves through bucketed batched
    # fusion contractions (algorithms/batched_fusion.py) — a few dozen
    # large batched GEMMs per matvec instead of a per-transition loop
    use_su2_packed = (
        not use_batched
        and _os.environ.get("HTN_NO_SU2_PACK", "") != "1"
        and all(op.ndim == 4 for W in H.Ws for op in W.values()))
    # whole-iteration fusion, SU(2) flavor: one jitted program per
    # iteration over the fusion-tree backend (fused_vumps_su2.py)
    if use_su2_packed and _os.environ.get("HTN_NO_FUSED", "") != "1":
        from .fused_vumps_su2 import vumps_fused_loop_su2
        fused = vumps_fused_loop_su2(psi, H, envs, tol, maxiter,
                                     krylov_dim, verbosity)
        if fused is not None:
            psi_f, envs_f, energy_f, err_f, history_f, conv_f = fused
            if verbosity >= 1:
                print(f"[vumps] done: e={energy_f:+.12f} err={err_f:.3e} "
                      f"iters={len(history_f)}")
            return VUMPSResult(psi_f, envs_f, energy_f, float(err_f),
                               len(history_f), conv_f, history_f)
    if use_su2_packed:
        from ..mpo.su2_pack import PackedMPOSU2
        pm2 = PackedMPOSU2(H)
        bsites2 = [_BatchedSiteSU2(H, pm2, x, psi) for x in range(T)]
    # polar (matmul-only) gauge on f32 — the TPU deployment dtype; QR keeps
    # exact isometries for the f64 convergence runs (HTN_GAUGE overrides).
    # Each backend has its own bucketed plan (batched_gauge / _su2).
    gauge_mode = _os.environ.get("HTN_GAUGE", "auto")
    is_su2 = getattr(psi.group, "has_su2", False)
    use_polar = (
        gauge_mode == "polar" or (
            gauge_mode == "auto"
            and jnp.dtype(psi.ALs[0].dtype) == jnp.dtype(jnp.float32)))
    gauge_plans: Dict[int, tuple] = {}
    from ..utils.profiling import StageTimer, fmt_stage_ms
    timer = StageTimer()
    for it in range(maxiter):
        timer.reset()
        # dynamic inner tolerance: eigenproblems a bit tighter than the error
        inner_tol = max(min(1e-3, err * 1e-2), tol * 1e-2)
        # rebuild packers if a rank-deficient QR shrank any bond space
        if any(pk_acs[x].spaces != psi.AC(x).spaces for x in range(T)):
            pk_acs = [Packer(full_blocks(psi.AC(x))) for x in range(T)]
            pk_cs = [Packer(full_blocks(psi.Cs[x])) for x in range(T)]
        ACs_new: List[SymTensor] = []
        Cs_new: List[SymTensor] = []
        timer.mark("eigs")
        for x in range(T):
            GLx, Wx, GRx = envs.GLs[x], H.Ws[x], envs.GRs[x]
            GLx1 = envs.GLs[(x + 1) % T]
            pk_ac, pk_c = pk_acs[x], pk_cs[x]
            AC0, C0 = full_blocks(psi.AC(x)), full_blocks(psi.Cs[x])

            if use_batched:
                bs = bsites[x]
                GLp, GRp, GL1p, GR1p = bs.ensure(GLx, GRx, GLx1, AC0, C0,
                                                 envs=envs)
                plan_ac, plan_c = bs.plan_ac, bs.plan_c
                # fully-jitted Lanczos restarts: one dispatch + one host
                # sync per restart instead of one dispatch per matvec
                _, v_ac, _ = lanczos_ground_plan(
                    plan_ac, (GLp, GRp), plan_ac.pack_vec(AC0),
                    krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
                ACs_new.append(plan_ac.unpack_vec(v_ac, AC0))
                _, v_c, _ = lanczos_ground_plan(
                    plan_c, (GL1p, GR1p), plan_c.pack_vec(C0),
                    krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
                Cs_new.append(plan_c.unpack_vec(v_c, C0))
                continue

            if use_su2_packed:
                bs = bsites2[x]
                GLp, GRp, GL1p, GR1p = bs.ensure(GLx, GRx, GLx1, AC0, C0)
                plan_ac, plan_c = bs.plan_ac, bs.plan_c
                _, v_ac, _ = lanczos_ground_plan(
                    plan_ac, (GLp, GRp), plan_ac.pack_vec(AC0),
                    krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
                ACs_new.append(plan_ac.unpack_vec(v_ac, AC0))
                _, v_c, _ = lanczos_ground_plan(
                    plan_c, (GL1p, GR1p), plan_c.pack_vec(C0),
                    krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
                Cs_new.append(plan_c.unpack_vec(v_c, C0))
                continue

            _, v_ac, _ = lanczos_ground_plan(
                _DictHACPlan(pk_ac), (GLx, Wx, GRx), pk_ac.pack(psi.AC(x)),
                krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
            ACs_new.append(pk_ac.unpack(v_ac))

            _, v_c, _ = lanczos_ground_plan(
                _DictHCPlan(pk_c), (GLx1, GRx), pk_c.pack(psi.Cs[x]),
                krylov_dim=krylov_dim, tol=inner_tol, max_restarts=20)
            Cs_new.append(pk_c.unpack(v_c))

        ALs_new, ARs_new = [], []
        err = 0.0
        timer.mark("gauge")
        for x in range(T):
            if use_polar:
                key = (ACs_new[x].structure(), Cs_new[(x - 1) % T].structure(),
                       Cs_new[x].structure())
                if is_su2:
                    from .batched_gauge_su2 import (PolarGaugePlanSU2,
                                                    gauge_site_polar_su2)
                    mk_plan, run_gauge = PolarGaugePlanSU2, \
                        gauge_site_polar_su2
                else:
                    from .batched_gauge import (PolarGaugePlan,
                                                gauge_site_polar)
                    mk_plan, run_gauge = PolarGaugePlan, gauge_site_polar
                if gauge_plans.get(x, (None, None))[0] != key:
                    gauge_plans[x] = (key, mk_plan(
                        ACs_new[x], Cs_new[(x - 1) % T], Cs_new[x]))
                AL, AR, dl, dr = run_gauge(
                    ACs_new[x], Cs_new[(x - 1) % T], Cs_new[x],
                    plan=gauge_plans[x][1])
            else:
                AL, AR, dl, dr = _gauge_site(ACs_new[x], Cs_new[(x - 1) % T],
                                             Cs_new[x])
            ALs_new.append(AL)
            ARs_new.append(AR)
            err = max(err, float(dl), float(dr))

        psi = UniformMPS(ALs_new, ARs_new, Cs_new)
        timer.mark("envs")
        envs = Environments(psi, H, tol=max(min(tol * 1e-2, err * 1e-3), 1e-14),
                            prev=envs)
        energy = float(jnp.real(envs.energy_per_site))
        timer.mark(None)
        history.append({"iter": it, "energy": energy, "error": err,
                        "stage_ms": timer.ms()})
        if verbosity >= 2:
            print(f"[vumps] iter={it:3d}  e={energy:+.12f}  err={err:.3e}"
                  + (f"  [{fmt_stage_ms(timer.ms())}]"
                     if verbosity >= 3 else ""))
        if err < tol:
            converged = True
            break
    if verbosity >= 1:
        print(f"[vumps] done: e={energy:+.12f} err={err:.3e} iters={len(history)}")
    return VUMPSResult(psi, envs, energy, float(err), len(history), converged, history)
