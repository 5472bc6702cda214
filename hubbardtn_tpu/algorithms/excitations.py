"""Quasiparticle excitations on uniform MPS (tangent-space ansatz).

TPU-native equivalent of MPSKit's ``excitations(H, QuasiparticleAnsatz(...),
momenta, psi, envs; num, sector)`` driven by the reference at
/root/reference/src/HubbardFunctions.jl:1173-1212.

The ansatz: |Phi_p(B)> = sum_n e^{ipn} (cells translated by n) with one site
tensor replaced by B[x] = NL[x] X[x]; NL is the left null space of AL, so
the states are orthogonal to the ground state and <Phi'|Phi> reduces to
sum_x <X'[x], X[x]>.  The effective Hamiltonian per momentum needs two
geometric sums over mixed AL/AR cell transfers, solved with GMRES; the unit
eigenvalue of the mixed transfer (trivial charge sector at p = 0) is
projected out exactly as in the ground-state environment solves.

Charged sectors: X[x] carries the excitation charge q as its SymTensor
charge; all environment bookkeeping follows automatically from the graded
tensor algebra.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS
from ..solvers.krylov import TreePacker, gmres, lanczos_ground
from ..symmetry.groups import Sector
from ..tensor import linalg as tla
from ..tensor.symtensor import IN, OUT, SymTensor, tensordot
from .environments import Environments, mpo_transfer_left, mpo_transfer_right
from .vumps import apply_H_AC

from ..utils.device import host_built

def _to_complex(t: SymTensor) -> SymTensor:
    return t.astype(jnp.complex128)


def _env_complex(env: Dict[int, SymTensor]) -> Dict[int, SymTensor]:
    return {a: _to_complex(t) for a, t in env.items()}


def _zero_like_env(template: Dict[int, SymTensor], q: Sector, group,
                   spaces) -> Dict[int, SymTensor]:
    """Zero environment dict with an extra ket-side charge q and explicit
    (bra_space, ket_space) legs — the mixed AL/AR environments of the
    excitation live between *different* gauge bases.

    SU(2): channel legs stay explicit (3-leg templates, trivial tensor
    charge); the excitation charge q is the tensor's hidden charge — the
    only non-neutral object in the network, so all fusions stay
    single-valued."""
    out = {}
    for a, t in template.items():
        sp = tuple(spaces) + ((t.spaces[2],) if t.ndim == 3 else ())
        charge = q if t.ndim == 3 else group.fuse(t.charge, q)
        out[a] = type(t).zeros(t.group, sp, t.arrows, charge=charge,
                               dtype=jnp.complex128)
    return out


def _add_env(A: Dict[int, SymTensor], B: Dict[int, SymTensor]):
    out = dict(A)
    for a, t in B.items():
        out[a] = out[a] + t if a in out else t
    return out


def _canon_env(template: Dict[int, SymTensor], data: Dict[int, SymTensor]):
    out = {}
    for a, z in template.items():
        d = data.get(a)
        out[a] = z if d is None else z + d
    return out


def _shifted_mpo(H: MPOHamiltonian, e_site: float) -> MPOHamiltonian:
    """H - e_site * Id per site: the uniform energy shift that makes every
    environment growth-free.  With the shifted MPO, *all* diagrams of the
    excitation matrix elements carry their -e subtraction automatically and
    the effective eigenvalues are excitation energies directly."""
    ident = H.site.op("id")
    g = H.site.group
    if getattr(g, "has_su2", False):
        from ..ops.sites_su2 import attach_channels
        ident_dense = np.asarray(ident.to_dense())[..., None]
        shift0 = attach_channels(g, ident_dense * (-e_site), H.site.space,
                                 g.trivial, g.trivial, g.trivial)
    else:
        shift0 = ident * (-e_site)
    Ws = []
    for x in range(H.T):
        W = dict(H.Ws[x])
        # on-site shift rides the (INIT at bond x) -> (FINAL at bond x+1) edge
        key = (0, H.n_channels[(x + 1) % H.T] - 1)
        W[key] = W[key] + shift0 if key in W else shift0
        Ws.append(W)
    return MPOHamiltonian(H.site, H.T, H.n_channels, H.charges, Ws, H.max_len)


class QuasiparticleProblem:
    """Per-(state, H, sector) data for the excitation eigenproblem.

    With ``psi_right`` given, builds the *topological* (domain-wall) ansatz:
    AL tensors from the left ground state, AR tensors from the right one
    (reference DW path, src/HubbardFunctions.jl:1203-1206 with a
    circshifted ket)."""

    def __init__(self, psi: UniformMPS, H: MPOHamiltonian, envs: Environments,
                 sector: Sector, psi_right: Optional[UniformMPS] = None,
                 envs_right: Optional[Environments] = None):
        # work with the energy-shifted Hamiltonian H - e_site * Id: its
        # environments are growth-free and the effective eigenvalues are
        # excitation energies with no offset corrections
        e_site = float(np.real(envs.energy_per_site))
        H = _shifted_mpo(H, e_site)
        # environment tolerance adapts to the working precision: 1e-12 is
        # reachable in f64 but f32/c64 (the TPU deployment dtypes) stall at
        # ~eps, and a fixed 1e-12 would burn every GMRES max_restart
        eps = float(jnp.finfo(jnp.real(jnp.zeros(
            (), dtype=psi.ALs[0].dtype)).dtype).eps)
        env_tol = max(1e-12, 30 * eps)
        envs = Environments(psi, H, tol=env_tol)
        resid_e = float(np.real(envs.energy_per_site))
        if abs(resid_e) > max(1e-6, 1e3 * eps) * max(1.0, abs(e_site)):
            print(f"Warning: shifted-MPO residual energy {resid_e:.2e}")
        self.topological = psi_right is not None
        psi_r = psi_right if self.topological else psi
        envs_r = (Environments(psi_r, H, tol=env_tol)
                  if self.topological else envs)
        self.H = H
        self.T = psi.T
        self.group = psi.group
        self.q = tuple(sector)
        self.ALs = [_to_complex(t) for t in psi.ALs]
        self.ARs = [_to_complex(t) for t in psi_r.ARs]
        self.Cs = [_to_complex(t) for t in psi.Cs]
        self.Cs_r = [_to_complex(t) for t in psi_r.Cs]
        self.GLs = [_env_complex(e) for e in envs.GLs]
        self.GRs = [_env_complex(e) for e in envs_r.GRs]
        self.Ws = tuple({k: _to_complex(op) for k, op in W.items()}
                        for W in H.Ws)
        self.NLs = [tla.left_null(self.ALs[x], 2) for x in range(self.T)]
        g = self.group
        self.Xt: List[SymTensor] = []
        cls = type(self.ALs[0])
        for x in range(self.T):
            nl = self.NLs[x].spaces[2]
            vr = self.ARs[x].spaces[2]
            self.Xt.append(cls.zeros(g, (nl, vr), (IN, OUT),
                                     charge=self.q,
                                     dtype=jnp.complex128))
        self.n_params = sum(
            sum(int(np.prod(t.key_shape(k))) for k in t.allowed_keys())
            for t in self.Xt)
        # The diagrammatic assembly of H_eff carries the same regularization
        # constant as the ground state's own effective Hamiltonian: the
        # completed-left (GL_F) and started-right (GR_I) gauges drop the
        # bond-crossing energy, which shifts every assembled Rayleigh
        # quotient by lambda_AC(gs).  Excitation energies are the
        # difference, so the constant cancels exactly:
        #     omega = eig(H_eff) - lambda_AC(gs).
        # (Verified to 8 digits against finite-window referees and the
        # Bethe-ansatz bound for the u=5 Hubbard chain; exactly zero for
        # band insulators, which is why insulator tests were blind to it.)
        from .vumps import apply_H_AC as _hac
        GRs_left = ([_env_complex(e) for e in envs.GRs] if self.topological
                    else self.GRs)
        lam = []
        for x in range(self.T):
            AC = tensordot(self.ALs[x], self.Cs[x], axes=([2], [0]))
            HAC = _hac(self.GLs[x], self.Ws[x], GRs_left[x], AC)
            lam.append(complex(AC.inner(HAC)) / complex(AC.inner(AC)))
        self.lam0 = float(np.mean(np.real(lam)))
        if np.max(np.abs(np.imag(lam))) > 1e-8 or np.std(np.real(lam)) > 1e-6:
            print(f"Warning: inconsistent ground lambda_AC across sites: {lam}")
        self.packer = TreePacker(
            [SymTensorFull(t) for t in self.Xt], dtype=jnp.complex128)
        # environment templates per bond for the geometric sums:
        # LB is GL-like with bra = AL basis, ket = AR basis;
        # RB is GR-like with ket = AL basis, bra = AR basis.
        T = self.T
        self.LB_ts = [
            _zero_like_env(self.GLs[x], self.q, g,
                           (self.ALs[x].spaces[0], self.ARs[x].spaces[0]))
            for x in range(T)]
        self.RB_ts = [
            _zero_like_env(self.GRs[x], self.q, g,
                           (self.ALs[x].spaces[2], self.ARs[x].spaces[2]))
            for x in range(T)]
        self.LB_t = self.LB_ts[0]
        self.RB_t = self.RB_ts[T - 1]
        self.lb_packer = TreePacker(self.LB_t, dtype=jnp.complex128)
        self.rb_packer = TreePacker(self.RB_t, dtype=jnp.complex128)
        # unit-eigenvalue data (trivial sector): mixed-transfer eigvec = C.
        # In SU(2) mode the environments carry explicit channel legs, so the
        # projector vector gets a trivial channel appended per side.
        C0 = self.Cs[self.T - 1]
        if getattr(g, "has_su2", False):
            from ..tensor.fusion import append_trivial_leg
            self.C0L = append_trivial_leg(C0, False)   # GL-like: ch IN
            self.C0R = append_trivial_leg(C0, True)    # GR-like: ch OUT
        else:
            self.C0L = self.C0R = C0
        self.C0 = C0
        self._progs: Dict[bool, tuple] = {}

    def Bs_from_X(self, Xs: List[SymTensor]) -> List[SymTensor]:
        return [tensordot(self.NLs[x], Xs[x], axes=([2], [0]))
                for x in range(self.T)]

    def _raw_programs(self, project: bool):
        """Un-jitted closures of the H_eff pipeline (see :meth:`_programs`):
        ``pre(vecX, phase)``, ``restartL/R(x, b, phase)``,
        ``post(vecX, lb_vec, rb_vec)``.  All four are pure functions of
        traced arrays (constants baked in), so they can be jitted directly
        (serial path) or vmapped over a momentum batch (batched path)."""
        from ..solvers.krylov import _gmres_restart_core
        T = self.T
        Ws, ALs, ARs = self.Ws, self.ALs, self.ARs
        GLs, GRs = self.GLs, self.GRs
        lbp, rbp, pk = self.lb_packer, self.rb_packer, self.packer
        C0L, C0R = self.C0L, self.C0R
        fin = max(self.RB_t.keys())

        def pre(vecX, phase):
            Xs = pk.unpack(vecX)
            Bs = self.Bs_from_X(Xs)
            cur = self.LB_t
            for y in range(T):
                tmpl = self.LB_ts[(y + 1) % T]
                cur = _canon_env(tmpl, mpo_transfer_left(cur, Ws[y], ARs[y],
                                                         ALs[y]))
                ins = mpo_transfer_left(GLs[y], Ws[y], Bs[y], ALs[y])
                cur = _canon_env(tmpl, _add_env(cur, ins))
            CB = cur
            if project:
                CB = dict(CB)
                CB[0] = _proj_out(CB[0], C0L, self.C0.inner(self.C0))
            rhs = lbp.pack(jax.tree_util.tree_map(
                lambda t: jnp.conj(phase) * t, CB))
            cur = self.RB_t
            for y in reversed(range(T)):
                tmpl = self.RB_ts[(y - 1) % T]
                cur = _canon_env(tmpl, mpo_transfer_right(cur, Ws[y], ALs[y],
                                                          ARs[y]))
                ins = mpo_transfer_right(GRs[y], Ws[y], Bs[y], ARs[y])
                cur = _canon_env(tmpl, _add_env(cur, ins))
            CBr = cur
            if project:
                CBr = dict(CBr)
                CBr[fin] = _proj_out(CBr[fin], C0R, self.C0.inner(self.C0))
            rhs_r = rbp.pack(jax.tree_util.tree_map(
                lambda t: phase * t, CBr))
            return rhs, rhs_r

        def restartL(x, b, phase, atol):
            def mv(v):
                return _mixL_core(v, Ws, tuple(ARs), tuple(ALs),
                                  jnp.conj(phase), C0L, project=project,
                                  packer=lbp)
            xn, resid, _ = _gmres_restart_core(mv, x, b, 30, atol=atol)
            return xn, resid

        def restartR(x, b, phase, atol):
            def mv(v):
                return _mixR_core(v, Ws, tuple(ALs), tuple(ARs), phase,
                                  C0R, fin=fin, project=project, packer=rbp)
            xn, resid, _ = _gmres_restart_core(mv, x, b, 30, atol=atol)
            return xn, resid

        def post(vecX, lb_vec, rb_vec):
            Xs = pk.unpack(vecX)
            Bs = self.Bs_from_X(Xs)
            LBs = [lbp.unpack(lb_vec)]
            for x in range(T - 1):
                tmpl = self.LB_ts[x + 1]
                nxt = _canon_env(tmpl, mpo_transfer_left(LBs[x], Ws[x],
                                                         ARs[x], ALs[x]))
                ins = mpo_transfer_left(GLs[x], Ws[x], Bs[x], ALs[x])
                LBs.append(_canon_env(tmpl, _add_env(nxt, ins)))
            RBs: List = [None] * T
            RBs[T - 1] = rbp.unpack(rb_vec)
            for x in reversed(range(1, T)):
                tmpl = self.RB_ts[x - 1]
                nxt = _canon_env(tmpl, mpo_transfer_right(RBs[x], Ws[x],
                                                          ALs[x], ARs[x]))
                ins = mpo_transfer_right(GRs[x], Ws[x], Bs[x], ARs[x])
                RBs[x - 1] = _canon_env(tmpl, _add_env(nxt, ins))
            out = []
            for x in range(T):
                G = apply_H_AC(GLs[x], Ws[x], GRs[x], Bs[x])
                G = G + apply_H_AC(LBs[x], Ws[x], GRs[x], ARs[x])
                G = G + apply_H_AC(GLs[x], Ws[x], RBs[x], ALs[x])
                Xp = tensordot(self.NLs[x].conj(), G, axes=([0, 1], [0, 1]))
                out.append(SymTensorFull(self.Xt[x]) + Xp)
            return pk.pack(out)

        return pre, restartL, restartR, post

    def _programs(self, project: bool):
        """Per-problem jitted H_eff pipeline (the SU2EnvEngine pattern:
        constant tensors are baked into per-instance programs, traced once
        per problem).  Four programs: ``pre`` (unpack X -> within-cell
        sweeps -> packed GMRES right-hand sides for both geometric sums),
        one fully-on-device 30-step GMRES restart per side, and ``post``
        (boundary solutions -> interior fills -> gradient assembly ->
        packed output).  The host syncs once per GMRES restart on its
        scalar residual; everything else is three dispatches per H_eff
        application — the dict path's per-contraction dispatch latency
        would dominate over the TPU tunnel."""
        if project not in self._progs:
            self._progs[project] = tuple(
                jax.jit(f) for f in self._raw_programs(project))
        return self._progs[project]

    def _programs_batched(self, project: bool):
        """Momentum-batched H_eff pipeline: the same four programs vmapped
        over a leading momentum axis (vecX: [K, n], phase: [K]).  One
        dispatch drives every momentum of a dispersion scan at once — the
        lanes are independent eigenproblems of identical structure, so the
        batch turns K underutilizing programs (and K dispatch round trips
        per stage, ~0.5 s each over the TPU tunnel) into one MXU-saturating
        program per stage."""
        key = ("batched", project)
        if key not in self._progs:
            self._progs[key] = tuple(
                jax.jit(jax.vmap(f)) for f in self._raw_programs(project))
        return self._progs[key]


def SymTensorFull(t: SymTensor) -> SymTensor:
    """Zero tensor with the complete allowed-block table (stable pytree)."""
    return type(t).zeros(t.group, t.spaces, t.arrows, t.charge, t.dtype)


# ----------------------------------------------------------------------
# cell maps (jitted; structure-stable per problem)
# ----------------------------------------------------------------------

def _proj_out(X: SymTensor, C0: SymTensor, nrm) -> SymTensor:
    """Remove the C0-component: X - C0 <C0, X> / <C0, C0>."""
    return X - C0 * (C0.inner(X) / nrm)


def _mixL_core(vec, Ws, kets, bras, phase, C0, *, project: bool,
               packer: TreePacker):
    """(1 - phase * P T_mixL) applied to a packed boundary environment."""
    env = packer.unpack(vec)
    zero = jax.tree_util.tree_map(jnp.zeros_like, env)
    cur = env
    for W, A, B in zip(Ws, kets, bras):
        cur = mpo_transfer_left(cur, W, A, B)
    cur = _canon_env(zero, cur)
    if project:
        cur = dict(cur)
        cur[0] = _proj_out(cur[0], C0, C0.inner(C0))
    out = jax.tree_util.tree_map(lambda a, b: a - phase * b, env, cur)
    return packer.pack(out)


def _mixR_core(vec, Ws, kets, bras, phase, C0, *, fin: int, project: bool,
               packer: TreePacker):
    env = packer.unpack(vec)
    zero = jax.tree_util.tree_map(jnp.zeros_like, env)
    cur = env
    for W, A, B in zip(reversed(Ws), reversed(kets), reversed(bras)):
        cur = mpo_transfer_right(cur, W, A, B)
    cur = _canon_env(zero, cur)
    if project:
        cur = dict(cur)
        cur[fin] = _proj_out(cur[fin], C0, C0.inner(C0))
    out = jax.tree_util.tree_map(lambda a, b: a - phase * b, env, cur)
    return packer.pack(out)


_mixL_op = partial(jax.jit, static_argnames=("packer", "project"))(_mixL_core)
_mixR_op = partial(jax.jit,
                   static_argnames=("packer", "fin", "project"))(_mixR_core)


def apply_heff(prob: QuasiparticleProblem, Xs: List[SymTensor],
               phase: complex, gmres_tol: float = 1e-10) -> List[SymTensor]:
    """One application of the momentum-space effective Hamiltonian."""
    T, Ws = prob.T, prob.Ws
    ALs, ARs = prob.ALs, prob.ARs
    GLs, GRs = prob.GLs, prob.GRs
    Bs = prob.Bs_from_X(Xs)
    trivial = prob.q == prob.group.trivial
    at_zero = abs(phase - 1.0) < 1e-10
    # the mixed AL/AR transfer has a unit eigenvalue only for the
    # non-topological ansatz in the trivial sector at k = 0
    project = trivial and at_zero and not prob.topological

    # --- left geometric sum -----------------------------------------------
    # within-cell inflow: insert B at each site, then continue with AR kets
    cur: Dict[int, SymTensor] = prob.LB_t
    for y in range(T):
        tmpl = prob.LB_ts[(y + 1) % T]
        cur = _canon_env(tmpl, mpo_transfer_left(cur, Ws[y], ARs[y], ALs[y]))
        ins = mpo_transfer_left(GLs[y], Ws[y], Bs[y], ALs[y])
        cur = _canon_env(tmpl, _add_env(cur, ins))
    CB = cur
    nrmC = prob.C0.inner(prob.C0)
    if project:
        CB = dict(CB)
        CB[0] = _proj_out(CB[0], prob.C0L, nrmC)
    rhs = prob.lb_packer.pack(
        jax.tree_util.tree_map(lambda t: np.conj(phase) * t, CB))

    def mvL(v):
        return _mixL_op(v, Ws, tuple(ARs), tuple(ALs), np.conj(phase),
                        prob.C0L, project=project, packer=prob.lb_packer)

    lb_vec, _ = gmres(mvL, rhs, krylov_dim=30, tol=gmres_tol, max_restarts=10)
    LB0 = prob.lb_packer.unpack(lb_vec)

    LBs = [LB0]
    for x in range(T - 1):
        tmpl = prob.LB_ts[x + 1]
        nxt = _canon_env(tmpl,
                         mpo_transfer_left(LBs[x], Ws[x], ARs[x], ALs[x]))
        ins = mpo_transfer_left(GLs[x], Ws[x], Bs[x], ALs[x])
        LBs.append(_canon_env(tmpl, _add_env(nxt, ins)))

    # --- right geometric sum ----------------------------------------------
    fin = max(prob.RB_t.keys())
    cur = prob.RB_t
    for y in reversed(range(T)):
        tmpl = prob.RB_ts[(y - 1) % T]
        cur = _canon_env(tmpl, mpo_transfer_right(cur, Ws[y], ALs[y], ARs[y]))
        ins = mpo_transfer_right(GRs[y], Ws[y], Bs[y], ARs[y])
        cur = _canon_env(tmpl, _add_env(cur, ins))
    CBr = cur
    if project:
        CBr = dict(CBr)
        CBr[fin] = _proj_out(CBr[fin], prob.C0R, nrmC)
    rhs_r = prob.rb_packer.pack(
        jax.tree_util.tree_map(lambda t: phase * t, CBr))

    def mvR(v):
        return _mixR_op(v, Ws, tuple(ALs), tuple(ARs), phase, prob.C0R,
                        fin=fin, project=project, packer=prob.rb_packer)

    rb_vec, _ = gmres(mvR, rhs_r, krylov_dim=30, tol=gmres_tol, max_restarts=10)
    RB0 = prob.rb_packer.unpack(rb_vec)

    RBs: List[Optional[Dict[int, SymTensor]]] = [None] * T
    RBs[T - 1] = RB0
    for x in reversed(range(1, T)):
        tmpl = prob.RB_ts[x - 1]
        nxt = _canon_env(tmpl,
                         mpo_transfer_right(RBs[x], Ws[x], ALs[x], ARs[x]))
        ins = mpo_transfer_right(GRs[x], Ws[x], Bs[x], ARs[x])
        RBs[x - 1] = _canon_env(tmpl, _add_env(nxt, ins))

    # --- assemble gradient --------------------------------------------------
    out: List[SymTensor] = []
    for x in range(T):
        G = apply_H_AC(GLs[x], Ws[x], GRs[x], Bs[x])
        G = G + apply_H_AC(LBs[x], Ws[x], GRs[x], ARs[x])
        G = G + apply_H_AC(GLs[x], Ws[x], RBs[x], ALs[x])
        Xp = tensordot(prob.NLs[x].conj(), G, axes=([0, 1], [0, 1]))
        out.append(SymTensorFull(prob.Xt[x]) + Xp)
    return out


def apply_heff_packed(prob: QuasiparticleProblem, vecX: jnp.ndarray,
                      phase: complex, gmres_tol: float = 1e-10,
                      max_restarts: int = 10) -> jnp.ndarray:
    """Packed-vector H_eff application through the per-problem jitted
    pipeline (see :meth:`QuasiparticleProblem._programs`).  Same diagrams
    and projector as :func:`apply_heff` (equality-tested); this is the form
    the eigensolvers drive."""
    trivial = prob.q == prob.group.trivial
    at_zero = abs(phase - 1.0) < 1e-10
    project = trivial and at_zero and not prob.topological
    pre, restartL, restartR, post = prob._programs(project)
    ph = jnp.asarray(phase, dtype=jnp.complex128)
    rhs, rhs_r = pre(vecX, ph)

    def solve(restart, b):
        bnorm = float(jnp.linalg.norm(b))
        if bnorm == 0.0:
            return jnp.zeros_like(b)
        x = jnp.zeros_like(b)
        atol = jnp.asarray(gmres_tol * bnorm)
        for _ in range(max_restarts):
            x, resid = restart(x, b, ph, atol)
            if float(resid) / bnorm < gmres_tol:
                break
        return x

    lb_vec = solve(restartL, rhs)
    rb_vec = solve(restartR, rhs_r)
    return post(vecX, lb_vec, rb_vec)


def _gmres_solve_batched(restart, B: jnp.ndarray, ph: jnp.ndarray,
                         tol: float, max_restarts: int) -> jnp.ndarray:
    """Per-lane restarted GMRES over a batch of independent systems.
    ``restart(X, B, ph) -> (X_new, resid[K])`` is a vmapped on-device
    restart.  Converged lanes are frozen (their X kept) while the rest keep
    restarting; the host syncs once per restart on the K residuals."""
    bnorm = np.asarray(jnp.linalg.norm(B, axis=1))
    X = jnp.zeros_like(B)
    done = bnorm == 0.0
    atol = jnp.asarray(tol * bnorm)   # per-lane early-exit thresholds
    for _ in range(max_restarts):
        if done.all():
            break
        Xn, resid = restart(X, B, ph, atol)
        keep = jnp.asarray(done)[:, None]
        X = jnp.where(keep, X, Xn)
        rel = np.asarray(resid) / np.maximum(bnorm, 1e-300)
        done = done | (rel < tol)
    return X


def apply_heff_packed_batched(prob: QuasiparticleProblem, Vb: jnp.ndarray,
                              phases: jnp.ndarray, project: bool,
                              gmres_tol: float = 1e-10,
                              max_restarts: int = 10) -> jnp.ndarray:
    """Momentum-batched H_eff: apply the effective Hamiltonian at every
    momentum of the batch in one vmapped pipeline (``Vb``: [K, n] packed X
    vectors, ``phases``: [K] unit-cell phases e^{ik}).  All lanes must
    share the ``project`` flag (the k = 0 trivial-sector projector changes
    the traced program); :func:`excitations` partitions momenta
    accordingly.  Same diagrams as :func:`apply_heff` per lane."""
    pre_b, restartL_b, restartR_b, post_b = prob._programs_batched(project)
    ph = jnp.asarray(phases, dtype=jnp.complex128)
    rhs, rhs_r = pre_b(Vb, ph)
    lb = _gmres_solve_batched(restartL_b, rhs, ph, gmres_tol, max_restarts)
    rb = _gmres_solve_batched(restartR_b, rhs_r, ph, gmres_tol, max_restarts)
    return post_b(Vb, lb, rb)


@host_built
def excitations(psi: UniformMPS, H: MPOHamiltonian, envs: Environments,
                momenta: Sequence[float], sector: Sector, num: int = 1,
                krylov_dim: int = 30, tol: float = 1e-6, verbosity: int = 0,
                psi_right: Optional[UniformMPS] = None,
                solver: str = "lanczos",
                batch_momenta: Optional[bool] = None,
                batch_lanes: int = 8) -> Tuple[np.ndarray, list]:
    """Lowest ``num`` excitation energies at each momentum (phase per unit
    cell = e^{i k}).  Returns (Es[len(momenta), num], X parameter lists).
    Pass ``psi_right`` (e.g. a circshifted ground state) for topological /
    domain-wall excitations.

    ``solver`` selects the eigensolver: "lanczos" (default; H_eff is
    Hermitian) or "arnoldi" — the reference's choice
    (``Arnoldi(krylovdim=30, tol=1e-6, eager=true)``,
    /root/reference/src/HubbardFunctions.jl:1176), which makes no
    Hermiticity assumption.

    ``batch_momenta`` (default: auto = on when it applies) solves all
    momenta with the same traced program (same projector flag) as ONE
    vmapped batched eigensolve — one momentum per lane — instead of a
    serial scan; both solvers batch (``num > 1`` runs the same per-state
    deflation as the serial path, with the momentum batch inside each
    state's restarted solve).  Lanes converge independently; the results
    are identical to the serial path up to eigensolver tolerance
    (equality-tested).  ``batch_lanes`` caps momenta per dispatch (the
    batched GMRES holds a Krylov basis per lane, so device memory grows
    linearly with the batch); longer scans run as equal-width chunks."""
    if solver not in ("lanczos", "arnoldi"):
        raise ValueError(f"unknown solver {solver!r}")
    prob = QuasiparticleProblem(psi, H, envs, sector, psi_right=psi_right)
    if prob.n_params == 0:
        raise ValueError(f"no excitation parameters in sector {sector}")
    pk = prob.packer
    Es = np.zeros((len(momenta), num), dtype=np.complex128)
    Xs_out: list = [None] * len(momenta)
    phases = [complex(np.exp(1j * k)) for k in momenta]
    trivial = prob.q == prob.group.trivial

    def _project(phase: complex) -> bool:
        return (trivial and abs(phase - 1.0) < 1e-10
                and not prob.topological)

    def _v0(ik: int) -> np.ndarray:
        rng = np.random.default_rng(42 + ik)
        return (rng.standard_normal(pk.total)
                + 1j * rng.standard_normal(pk.total))

    use_batch = (len(momenta) > 1
                 if batch_momenta is None else batch_momenta)
    handled = set()
    if use_batch:
        from ..solvers.krylov import (arnoldi_eig_batched,
                                      lanczos_ground_batched)
        groups: Dict[bool, list] = {}
        for ik, ph in enumerate(phases):
            groups.setdefault(_project(ph), []).append(ik)
        gmres_tol = max(tol * 1e-2, 1e-10)
        chunks = []
        for project, idxs in groups.items():
            if len(idxs) < 2:
                continue   # a single lane runs the serial path below
            # cap lanes per dispatch: the batched GMRES keeps a Krylov
            # basis per lane, so memory grows linearly with the batch —
            # long scans run as a few full-width chunks (ragged tails are
            # padded by repeating a lane, reusing the compiled programs)
            for s in range(0, len(idxs), batch_lanes):
                chunks.append((project, idxs[s:s + batch_lanes],
                               len(idxs) > batch_lanes))
        for project, chunk, padded_scan in chunks:
            idxs = chunk
            pad = batch_lanes - len(chunk) if padded_scan else 0
            lanes = list(chunk) + [chunk[-1]] * max(0, pad)
            ph_arr = jnp.asarray([phases[i] for i in lanes],
                                 dtype=jnp.complex128)
            V0 = jnp.asarray(np.stack([_v0(i) for i in lanes]),
                             dtype=jnp.complex128)

            def mv_b(Vb, _ph=ph_arr, _project=project):
                return apply_heff_packed_batched(prob, Vb, _ph, _project,
                                                 gmres_tol=gmres_tol)

            if solver == "arnoldi":
                Ws, Vlist, info = arnoldi_eig_batched(
                    mv_b, V0, num=num, krylov_dim=krylov_dim, tol=tol,
                    which="sr", max_restarts=40)
                for lane, ik in enumerate(idxs):
                    Es[ik, :] = Ws[lane] - prob.lam0
                    Xs_out[ik] = (pk.unpack(Vlist[0][lane]) if num == 1
                                  else [pk.unpack(Vm[lane])
                                        for Vm in Vlist])
                    handled.add(ik)
                    if verbosity >= 1:
                        print(f"[exc] k={momenta[ik]:.4f}"
                              f"  E={Ws[lane] - prob.lam0}"
                              f"  resid={info['resid'][lane]:.2e}"
                              " (batched arnoldi)")
            elif num == 1:
                ths, Vv, info = lanczos_ground_batched(
                    mv_b, V0, krylov_dim=krylov_dim, tol=tol,
                    max_restarts=40)
                for lane, ik in enumerate(idxs):
                    Es[ik, 0] = ths[lane] - prob.lam0
                    Xs_out[ik] = pk.unpack(Vv[lane])
                    handled.add(ik)
                    if verbosity >= 1:
                        print(f"[exc] k={momenta[ik]:.4f}"
                              f"  E={ths[lane] - prob.lam0:.8f}"
                              f"  resid={info['resid'][lane]:.2e} (batched)")
            else:
                Ws, Vlist = _lanczos_lowest_k_batched(
                    mv_b, V0, num, krylov_dim, tol)
                for lane, ik in enumerate(idxs):
                    Es[ik, :] = Ws[lane] - prob.lam0
                    Xs_out[ik] = [pk.unpack(Vm[lane]) for Vm in Vlist]
                    handled.add(ik)
                    if verbosity >= 1:
                        print(f"[exc] k={momenta[ik]:.4f}"
                              f"  E={Ws[lane] - prob.lam0} (batched)")
    for ik, k in enumerate(momenta):
        if ik in handled:
            continue
        phase = phases[ik]

        def mv(vec):
            return apply_heff_packed(prob, vec, phase,
                                     gmres_tol=max(tol * 1e-2, 1e-10))

        v0 = jnp.asarray(_v0(ik))
        if solver == "arnoldi":
            from ..solvers.krylov import arnoldi_eig
            ws, vs, info = arnoldi_eig(mv, v0, num=num,
                                       krylov_dim=krylov_dim, tol=tol,
                                       which="sr", max_restarts=40)
            Es[ik, :] = np.asarray(ws) - prob.lam0
            Xs_out[ik] = (pk.unpack(vs[0]) if num == 1
                          else [pk.unpack(v) for v in vs])
            if verbosity >= 1:
                print(f"[exc] k={k:.4f}  E={np.asarray(ws) - prob.lam0}"
                      f"  resid={info['resid']:.2e} (arnoldi)")
        elif num == 1:
            w, v, info = lanczos_ground(mv, v0, krylov_dim=krylov_dim,
                                        tol=tol, max_restarts=40)
            Es[ik, 0] = w - prob.lam0
            Xs_out[ik] = pk.unpack(v)
            if verbosity >= 1:
                print(f"[exc] k={k:.4f}  E={w - prob.lam0:.8f}"
                      f"  resid={info['resid']:.2e}  iters={info['iters']}")
        else:
            ws, vs = _lanczos_lowest_k(mv, v0, num, krylov_dim, tol)
            Es[ik, :] = np.asarray(ws) - prob.lam0
            Xs_out[ik] = [pk.unpack(v) for v in vs]
            if verbosity >= 1:
                print(f"[exc] k={k:.4f}  E={np.asarray(ws) - prob.lam0}")
    return Es, Xs_out


def _lanczos_lowest_k_batched(mv_b, V0, num, krylov_dim, tol,
                              max_restarts=40):
    """Momentum-batched counterpart of :func:`_lanczos_lowest_k`: the
    deflation loop over states stays serial (num is small), but each
    state's restarted solve runs every momentum lane at once on the
    batched operator.  Lane k's deflation basis is lane k's previously
    converged vectors, applied as batched projections P H P.

    Returns ``(Ws[K, num], [V_m[K, n] for m in range(num)])``.
    """
    from ..solvers.krylov import lanczos_ground_batched

    K, n = V0.shape
    Ws = np.zeros((K, num))
    Vlist: list = []
    rng = np.random.default_rng(7)
    for m in range(num):
        basis = jnp.stack(Vlist, axis=1) if Vlist else None   # [K, m, n]

        def project(X, _basis=basis):
            if _basis is None:
                return X
            c = jnp.einsum("kmn,kn->km", jnp.conj(_basis), X)
            return X - jnp.einsum("kmn,km->kn", _basis, c)

        def mv_defl(X, _project=project):
            return _project(mv_b(_project(X)))

        if m == 0:
            Vst = V0
        else:
            Vst = jnp.asarray(rng.standard_normal((K, n))
                              + 1j * rng.standard_normal((K, n)))
        Vst = project(Vst)
        Vst = Vst / jnp.linalg.norm(Vst, axis=1, keepdims=True)
        th, V, _info = lanczos_ground_batched(
            mv_defl, Vst, krylov_dim=krylov_dim, tol=tol,
            max_restarts=max_restarts)
        V = project(V)
        V = V / jnp.linalg.norm(V, axis=1, keepdims=True)
        Ws[:, m] = np.asarray(th)
        Vlist.append(V)
    return Ws, Vlist


def _lanczos_lowest_k(mv, v0, num, krylov_dim, tol, max_restarts=40):
    """num lowest eigenpairs by deflated restarted Lanczos: each state is
    converged by its own restarted solve on the operator projected onto the
    orthogonal complement of the previously converged states (P H P), so
    every returned pair carries its own residual control — unlike secondary
    Ritz pairs of a single lowest-targeted restart.  Hermitian counterpart
    of the reference's eager Arnoldi extraction
    (/root/reference/src/HubbardFunctions.jl:1176 with nums > 1)."""
    from ..solvers.krylov import lanczos_ground

    ws: list = []
    vs: list = []
    rng = np.random.default_rng(7)
    for m in range(num):
        basis = list(vs)

        def project(x):
            for vi in basis:
                x = x - vi * jnp.vdot(vi, x)
            return x

        def mv_defl(x):
            return project(mv(project(x)))

        v_start = project(v0 if m == 0 else jnp.asarray(
            rng.standard_normal(v0.shape[0])
            + 1j * rng.standard_normal(v0.shape[0])))
        nrm = jnp.linalg.norm(v_start)
        v_start = v_start / jnp.where(nrm > 0, nrm, 1.0)
        w, v, _info = lanczos_ground(mv_defl, v_start,
                                     krylov_dim=krylov_dim, tol=tol,
                                     max_restarts=max_restarts)
        v = project(v)
        v = v / jnp.linalg.norm(v)
        ws.append(float(np.asarray(w)))
        vs.append(v)
    return np.asarray(ws), vs
