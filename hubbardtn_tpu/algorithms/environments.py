"""MPO environment fixed points for uniform MPS.

TPU-native equivalent of MPSKit's ``environments(psi, H)`` (reference call
sites /root/reference/src/HubbardFunctions.jl:1017,1027,1205-1208).  The MPO
is the channel-sparse FSM of ``mpo/fsm.py``; environments are per-channel
2-leg :class:`SymTensor` bond operators:

* ``GL[a]`` at the bond left of a site: legs ``(bra IN, ket OUT)``, tensor
  charge = the FSM channel charge (accumulated operator charge to the left);
* ``GR[b]`` at the bond right of a site: legs ``(ket IN, bra OUT)``, charge
  dual to the channel charge.

Because the FSM has no cycles through intermediate channels (suffix lengths
strictly decrease), intermediate-channel environments are *finite* sums and
converge exactly after ``ceil(Lmax/T)`` unit-cell sweeps.  Only the FINAL
(left) / INIT (right) channels require the standard infinite geometric sum,
solved as a regularized linear problem with GMRES and energy subtraction —
the energy per unit cell falls out of the regularization.

All environment dicts carry *every* channel with the complete block table
(zero-filled where absent), so the whole pre-sweep + interior-fill pipeline
jits into a handful of stable XLA programs per MPS structure.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS, bond_identity, transfer_left, transfer_right
from ..solvers.krylov import Packer, full_blocks, gmres, gmres_plan
from ..symmetry.spaces import Space
from ..tensor.symtensor import IN, OUT, SymTensor, tensordot


def _ab_engine(psi: "UniformMPS", H: "MPOHamiltonian"):
    """The fully-batched abelian env engine for this (psi, H), or None when
    the structure (SU(2), 4-leg ops, complex W over a real state) or the
    HTN_NO_ENV_PACK=1 A/B knob keeps the dict path."""
    g = psi.group
    if (getattr(g, "has_su2", False)
            or os.environ.get("HTN_NO_ENV_PACK", "") == "1"
            or not all(op.ndim == 2 for W in H.Ws for op in W.values())):
        return None
    from .batched_env_ab import AbEnvEngine
    try:
        return AbEnvEngine.get(psi, H)
    except TypeError:  # complex MPO with a real state: dict path
        return None


def pair_envs(GL: SymTensor, GR: SymTensor) -> jnp.ndarray:
    """Scalar tr(GL . GR): close a left and right environment on one bond."""
    if GL.ndim == 3:  # SU(2): explicit channel legs close too
        out = tensordot(GL, GR, axes=([1, 0, 2], [0, 1, 2]))
    else:
        out = tensordot(GL, GR, axes=([1, 0], [0, 1]))
    return out.scalar()


def _acc(out: Dict[int, SymTensor], b: int, contrib: SymTensor):
    if b in out:
        out[b] = out[b] + contrib
    else:
        out[b] = contrib


def mpo_transfer_left(GL: Dict[int, SymTensor], W, A: SymTensor,
                      B: SymTensor) -> Dict[int, SymTensor]:
    """One-site left-to-right environment update.  A = ket tensor, B = tensor
    whose conjugate forms the bra (both AL in practice)."""
    out: Dict[int, SymTensor] = {}
    Bc = B.conj()
    for (a, b), op in W.items():
        X = GL.get(a)
        if X is None or not X.blocks:
            continue
        if op.ndim == 4:
            Y = tensordot(X, A, axes=([1], [0]))        # (bra, ch, p, k')
            Y = tensordot(op, Y, axes=([0, 2], [1, 2])) # (p_out, chb, bra, k')
            Z = tensordot(Bc, Y, axes=([0, 1], [2, 0])) # (bra', chb, k')
            _acc(out, b, Z.transpose((0, 2, 1)))        # (bra', k', chb)
        else:
            Y = tensordot(X, A, axes=([1], [0]))       # (bra, p, k')
            Y = tensordot(op, Y, axes=([1], [1]))      # (p_out, bra, k')
            _acc(out, b, tensordot(Bc, Y, axes=([0, 1], [1, 0])))
    return out


def mpo_transfer_right(GR: Dict[int, SymTensor], W, A: SymTensor,
                       B: SymTensor) -> Dict[int, SymTensor]:
    """One-site right-to-left environment update (returns env at left bond)."""
    out: Dict[int, SymTensor] = {}
    Bc = B.conj()
    for (a, b), op in W.items():
        X = GR.get(b)
        if X is None or not X.blocks:
            continue
        if op.ndim == 4:
            Y = tensordot(A, X, axes=([2], [0]))        # (vl, p, bra, ch)
            Y = tensordot(op, Y, axes=([3, 2], [3, 1])) # (cha, p_out, vl, bra)
            Z = tensordot(Y, Bc, axes=([1, 3], [1, 2])) # (cha, vl=ket', bra')
            _acc(out, a, Z.transpose((1, 2, 0)))        # (ket', bra', cha)
        else:
            Y = tensordot(A, X, axes=([2], [0]))       # (vl, p, bra)
            Y = tensordot(op, Y, axes=([1], [1]))      # (p_out, vl, bra)
            # contract p_out with bra p, bra leg with bra vr
            _acc(out, a, tensordot(Y, Bc, axes=([0, 2], [1, 2])))
    return out


def rho_right(C: SymTensor) -> SymTensor:
    """C C^dag: right-closing density (ket IN, bra OUT) on the AL bond basis."""
    return tensordot(C, C.conj(), axes=([1], [1]))


def rho_left(C: SymTensor) -> SymTensor:
    """C^dag C: left-closing density (bra IN, ket OUT) on the AR bond basis."""
    return tensordot(C.conj(), C, axes=([0], [0]))


def _zero_env_left(group, V: Space, charges, dtype) -> Dict[int, SymTensor]:
    if getattr(group, "has_su2", False):
        from ..ops.sites_su2 import channel_space
        from ..tensor.fusion import FusionTensor
        return {a: FusionTensor.zeros(group,
                                      (V, V, channel_space(group, qa)),
                                      (IN, OUT, IN), dtype=dtype)
                for a, qa in enumerate(charges)}
    return {a: SymTensor.zeros(group, (V, V), (IN, OUT), charge=qa, dtype=dtype)
            for a, qa in enumerate(charges)}


def _zero_env_right(group, V: Space, charges, dtype) -> Dict[int, SymTensor]:
    g = group
    if getattr(g, "has_su2", False):
        from ..ops.sites_su2 import channel_space
        from ..tensor.fusion import FusionTensor
        return {b: FusionTensor.zeros(g, (V, V, channel_space(g, qb)),
                                      (IN, OUT, OUT), dtype=dtype)
                for b, qb in enumerate(charges)}
    return {b: SymTensor.zeros(g, (V, V), (IN, OUT), charge=g.dual(qb),
                               dtype=dtype)
            for b, qb in enumerate(charges)}


def _canon(template: Dict[int, SymTensor],
           data: Dict[int, SymTensor]) -> Dict[int, SymTensor]:
    """Project ``data`` onto the full-channel zero template (adds missing
    channels/blocks as zeros)."""
    out = {}
    for a, z in template.items():
        d = data.get(a)
        out[a] = z if d is None else z + d
    return out


@partial(jax.jit, static_argnames=("n_sweeps", "fin"))
def _presweep_left(GL0, Ws, ALs, I0, *, n_sweeps: int, fin: int):
    """Iterate full-cell transfers to converge intermediate channels, then
    one more cell to extract the FINAL-channel inflow CF."""
    zero_fin = GL0[fin]
    cur = dict(GL0)
    cur[0] = I0
    for _ in range(n_sweeps):
        nxt = cur
        for W, A in zip(Ws, ALs):
            nxt = mpo_transfer_left(nxt, W, A, A)
        nxt = _canon(GL0, nxt)
        nxt[0] = I0
        nxt[fin] = zero_fin
        cur = nxt
    fill = cur
    for W, A in zip(Ws, ALs):
        fill = mpo_transfer_left(fill, W, A, A)
    fill = _canon(GL0, fill)
    CF = fill[fin]
    return cur, CF


@partial(jax.jit, static_argnames=("n_sweeps",))
def _presweep_right(GR0, Ws, ARs, I0, *, n_sweeps: int):
    fin = max(GR0.keys())
    zero_init = GR0[0]
    cur = dict(GR0)
    cur[fin] = I0
    for _ in range(n_sweeps):
        nxt = cur
        for W, A in zip(reversed(Ws), reversed(ARs)):
            nxt = mpo_transfer_right(nxt, W, A, A)
        nxt = _canon(GR0, nxt)
        nxt[fin] = I0
        nxt[0] = zero_init
        cur = nxt
    fill = cur
    for W, A in zip(reversed(Ws), reversed(ARs)):
        fill = mpo_transfer_right(fill, W, A, A)
    fill = _canon(GR0, fill)
    CI = fill[0]
    return cur, CI


class _RegLeftPlan:
    """Hashable operator plan for the regularized left fixed-point solve:
    (1 - T_cell + |I0)(rho|) on packed vectors.  Hashability lets the
    whole GMRES restart jit as one program (solvers/krylov.gmres_plan)."""

    __slots__ = ("packer",)

    def __init__(self, packer: Packer):
        self.packer = packer

    def matvec(self, vec, ALs, rho, I0, tr_rho):
        Y = self.packer.unpack(vec)
        TY = Y
        for A in ALs:
            TY = transfer_left(TY, A, A)
        corr = pair_envs(Y, rho) / tr_rho
        return self.packer.pack(Y - TY + corr * I0)

    def __hash__(self):
        return hash(("regL", self.packer))

    def __eq__(self, other):
        return isinstance(other, _RegLeftPlan) and self.packer == other.packer


class _RegRightPlan:
    __slots__ = ("packer",)

    def __init__(self, packer: Packer):
        self.packer = packer

    def matvec(self, vec, ARs, sig, I0, tr_sig):
        Y = self.packer.unpack(vec)
        TY = Y
        for A in reversed(ARs):
            TY = transfer_right(TY, A, A)
        corr = pair_envs(sig, Y) / tr_sig
        return self.packer.pack(Y - TY + corr * I0)

    def __hash__(self):
        return hash(("regR", self.packer))

    def __eq__(self, other):
        return isinstance(other, _RegRightPlan) and self.packer == other.packer


def _jit_fill_left(GL0, Ws, ALs, templates):
    """Interior fill: GLs[x] for x=1..T-1 from the bond-0 environment."""
    GLs = [GL0]
    cur = GL0
    for x in range(len(ALs) - 1):
        cur = _canon(templates[x + 1], mpo_transfer_left(cur, Ws[x], ALs[x], ALs[x]))
        GLs.append(cur)
    return GLs


_fill_left = jax.jit(_jit_fill_left)


def _jit_fill_right(GR0, Ws, ARs, templates):
    T = len(ARs)
    GRs = [None] * T
    GRs[T - 1] = GR0
    cur = GR0
    for x in reversed(range(1, T)):
        cur = _canon(templates[x - 1], mpo_transfer_right(cur, Ws[x], ARs[x], ARs[x]))
        GRs[x - 1] = cur
    return tuple(GRs)


_fill_right = jax.jit(_jit_fill_right)


def left_environments(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                      gl_final0: Optional[SymTensor] = None
                      ) -> Tuple[List[Dict[int, SymTensor]], jnp.ndarray]:
    """Left environments GLs[x] (bond left of site x) and energy/unit cell."""
    import os
    T = psi.T
    assert H.T == T
    dtype = psi.ALs[0].dtype
    g = psi.group
    if (getattr(g, "has_su2", False)
            and os.environ.get("HTN_NO_SU2_ENV_PACK", "") != "1"
            and all(op.ndim == 4 for W in H.Ws for op in W.values())):
        from .batched_env_su2 import SU2EnvEngine
        return SU2EnvEngine.get(psi, H).left(psi, H, tol, gl_final0)
    eng = _ab_engine(psi, H)
    if eng is not None:
        GLs, e, _stacks = eng.left(psi, H, tol, gl_final0)
        return GLs, e
    I0 = bond_identity(g, psi.ALs[0].spaces[0], dtype=dtype)
    su2 = getattr(g, "has_su2", False)
    if su2:
        from ..tensor.fusion import append_trivial_leg
        I0 = append_trivial_leg(I0, IN)
    fin = H.idx_final(0)
    ALt = tuple(psi.ALs)
    Wt = tuple(H.Ws)

    templates = [_zero_env_left(g, psi.ALs[x].spaces[0], H.charges[x], dtype)
                 for x in range(T)]
    n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
    GL0, CF = _presweep_left(templates[0], Wt, ALt, I0,
                             n_sweeps=n_sweeps, fin=fin)

    rho = rho_right(psi.Cs[T - 1])
    if su2:
        from ..tensor.fusion import append_trivial_leg
        rho = append_trivial_leg(rho, OUT)
    tr_rho = pair_envs(I0, rho)
    e = pair_envs(CF, rho) / tr_rho

    GL0 = dict(GL0)
    # HTN_NO_ENV_PACK=1 forces the per-block dict GMRES path (A/B debugging
    # knob: the packed path is block-exact but its different GEMM reduction
    # order changes trajectories in degenerate landscapes)
    if (type(CF) is SymTensor and CF.ndim == 2
            and os.environ.get("HTN_NO_ENV_PACK", "") != "1"):
        # abelian: fully-bucketed batched transfer inside the GMRES restart
        from .batched_env import RegLeftPackedPlan
        plan = RegLeftPackedPlan(psi, dtype=dtype)
        ops = (plan.pack_As(psi), plan.layout.pack_transposed(rho),
               plan.layout.pack(I0), tr_rho)
        rhs = plan.layout.pack(CF) - e * ops[2]
        x0 = plan.layout.pack(gl_final0) if (
            gl_final0 is not None and gl_final0.spaces == CF.spaces) else None
        y, _info = gmres_plan(plan, ops, rhs, x0=x0, krylov_dim=30, tol=tol,
                              max_restarts=20)
        GL0[fin] = plan.layout.unpack(y, CF)
    else:
        packer = Packer(CF)
        rhs = packer.pack(CF - e * I0)
        x0 = packer.pack(gl_final0) if (
            gl_final0 is not None and gl_final0.spaces == CF.spaces) else None
        y, _info = gmres_plan(_RegLeftPlan(packer), (ALt, rho, I0, tr_rho),
                              rhs, x0=x0, krylov_dim=30, tol=tol,
                              max_restarts=20)
        GL0[fin] = packer.unpack(y)

    GLs = _fill_left(GL0, Wt, ALt, templates)
    return list(GLs), e


def right_environments(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                       gr_init0: Optional[SymTensor] = None
                       ) -> Tuple[List[Dict[int, SymTensor]], jnp.ndarray]:
    """Right environments GRs[x] (bond right of site x) and energy/unit cell."""
    import os
    T = psi.T
    dtype = psi.ARs[0].dtype
    g = psi.group
    if (getattr(g, "has_su2", False)
            and os.environ.get("HTN_NO_SU2_ENV_PACK", "") != "1"
            and all(op.ndim == 4 for W in H.Ws for op in W.values())):
        from .batched_env_su2 import SU2EnvEngine
        return SU2EnvEngine.get(psi, H).right(psi, H, tol, gr_init0)
    eng = _ab_engine(psi, H)
    if eng is not None:
        GRs, e, _stacks = eng.right(psi, H, tol, gr_init0)
        return GRs, e
    I0 = bond_identity(g, psi.ARs[T - 1].spaces[2], dtype=dtype)
    su2 = getattr(g, "has_su2", False)
    if su2:
        from ..tensor.fusion import append_trivial_leg
        I0 = append_trivial_leg(I0, OUT)
    ARt = tuple(psi.ARs)
    Wt = tuple(H.Ws)

    # GRs[x] lives at the bond right of site x; its channel set is the bond
    # left of site x+1
    templates = [_zero_env_right(g, psi.ARs[x].spaces[2],
                                 H.charges[(x + 1) % T], dtype)
                 for x in range(T)]
    n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
    GR0, CI = _presweep_right(templates[T - 1], Wt, ARt, I0, n_sweeps=n_sweeps)

    sig = rho_left(psi.Cs[T - 1])
    if su2:
        from ..tensor.fusion import append_trivial_leg
        sig = append_trivial_leg(sig, IN)
    tr_sig = pair_envs(sig, I0)
    e = pair_envs(sig, CI) / tr_sig

    GR0 = dict(GR0)
    if (type(CI) is SymTensor and CI.ndim == 2
            and os.environ.get("HTN_NO_ENV_PACK", "") != "1"):
        from .batched_env import RegRightPackedPlan
        plan = RegRightPackedPlan(psi, dtype=dtype)
        ops = (plan.pack_As(psi), plan.layout.pack_transposed(sig),
               plan.layout.pack(I0), tr_sig)
        rhs = plan.layout.pack(CI) - e * ops[2]
        x0 = plan.layout.pack(gr_init0) if (
            gr_init0 is not None and gr_init0.spaces == CI.spaces) else None
        y, _info = gmres_plan(plan, ops, rhs, x0=x0, krylov_dim=30, tol=tol,
                              max_restarts=20)
        GR0[0] = plan.layout.unpack(y, CI)
    else:
        packer = Packer(CI)
        rhs = packer.pack(CI - e * I0)
        x0 = packer.pack(gr_init0) if (
            gr_init0 is not None and gr_init0.spaces == CI.spaces) else None
        y, _info = gmres_plan(_RegRightPlan(packer), (ARt, sig, I0, tr_sig),
                              rhs, x0=x0, krylov_dim=30, tol=tol,
                              max_restarts=20)
        GR0[0] = packer.unpack(y)

    GRs = _fill_right(GR0, Wt, ARt, templates)
    return list(GRs), e


class Environments:
    """Bundled left/right environments with the unit-cell energy."""

    def __init__(self, psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                 prev: "Environments" = None):
        gl0 = prev.GLs[0].get(H.idx_final(0)) if prev is not None else None
        gr0 = prev.GRs[psi.T - 1].get(0) if prev is not None else None
        # when the batched abelian engine serves this structure, keep its
        # stacked per-bond arrays too: vumps feeds them straight into
        # layout-matched bucketed solver plans (no dict repack round trip)
        self.ab_engine = _ab_engine(psi, H)
        if self.ab_engine is not None:
            self.GLs, eL, self.GL_stacks = self.ab_engine.left(
                psi, H, tol, gl_final0=gl0)
            self.GRs, eR, self.GR_stacks = self.ab_engine.right(
                psi, H, tol, gr_init0=gr0)
        else:
            self.GL_stacks = self.GR_stacks = None
            self.GLs, eL = left_environments(psi, H, tol, gl_final0=gl0)
            self.GRs, eR = right_environments(psi, H, tol, gr_init0=gr0)
        self.e_left = eL
        self.e_right = eR
        self.H = H
        self.psi = psi

    @property
    def energy_per_cell(self):
        return 0.5 * (self.e_left + self.e_right)

    @property
    def energy_per_site(self):
        return self.energy_per_cell / self.psi.T
