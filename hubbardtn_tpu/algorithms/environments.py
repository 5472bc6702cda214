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
the energy per unit cell falls out of the regularization.  The cell-transfer
operator inside GMRES is a single jitted XLA program over packed vectors.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS, bond_identity, transfer_left, transfer_right
from ..solvers.krylov import Packer, full_blocks, gmres
from ..tensor.symtensor import SymTensor, tensordot


def pair_envs(GL: SymTensor, GR: SymTensor) -> jnp.ndarray:
    """Scalar tr(GL . GR): close a left and right environment on one bond."""
    out = tensordot(GL, GR, axes=([1, 0], [0, 1]))
    if not out.blocks:
        return jnp.zeros((), dtype=GL.dtype)
    return out.blocks[()]


def _acc(out: Dict[int, SymTensor], b: int, contrib: SymTensor):
    if b in out:
        out[b] = out[b] + contrib
    else:
        out[b] = contrib


def mpo_transfer_left(GL: Dict[int, SymTensor], W, A: SymTensor, B: SymTensor,
                      ident: SymTensor) -> Dict[int, SymTensor]:
    """One-site left-to-right environment update.  A = ket tensor, B = tensor
    whose conjugate forms the bra (both AL in practice)."""
    out: Dict[int, SymTensor] = {}
    Bc = B.conj()
    for (a, b), op in W.items():
        X = GL.get(a)
        if X is None or not X.blocks:
            continue
        if op is ident:
            _acc(out, b, transfer_left(X, A, B))
        else:
            Y = tensordot(X, A, axes=([1], [0]))       # (bra, p, k')
            Y = tensordot(op, Y, axes=([1], [1]))      # (p_out, bra, k')
            _acc(out, b, tensordot(Bc, Y, axes=([0, 1], [1, 0])))
    return out


def mpo_transfer_right(GR: Dict[int, SymTensor], W, A: SymTensor, B: SymTensor,
                       ident: SymTensor) -> Dict[int, SymTensor]:
    """One-site right-to-left environment update (returns env at left bond)."""
    out: Dict[int, SymTensor] = {}
    Bc = B.conj()
    for (a, b), op in W.items():
        X = GR.get(b)
        if X is None or not X.blocks:
            continue
        if op is ident:
            _acc(out, a, transfer_right(X, A, B))
        else:
            Y = tensordot(A, X, axes=([2], [0]))       # (vl, p, bra)
            Y = tensordot(op, Y, axes=([1], [1]))      # (p_out, vl, bra)
            # contract p_out with bra p, bra leg with bra vr -> (ket IN, bra OUT)
            _acc(out, a, tensordot(Y, Bc, axes=([0, 2], [1, 2])))
    return out


def rho_right(C: SymTensor) -> SymTensor:
    """C C^dag: right-closing density (ket IN, bra OUT) on the AL bond basis."""
    return tensordot(C, C.conj(), axes=([1], [1]))


def rho_left(C: SymTensor) -> SymTensor:
    """C^dag C: left-closing density (bra IN, ket OUT) on the AR bond basis."""
    return tensordot(C.conj(), C, axes=([0], [0]))


@partial(jax.jit, static_argnames=("packer",))
def _reg_left_op(vec, ALs, rho, I0, tr_rho, *, packer: Packer):
    """(1 - T_cell + |I0)(rho|) applied to a packed left environment."""
    Y = packer.unpack(vec)
    TY = Y
    for A in ALs:
        TY = transfer_left(TY, A, A)
    corr = pair_envs(Y, rho) / tr_rho
    return packer.pack(Y - TY + corr * I0)


@partial(jax.jit, static_argnames=("packer",))
def _reg_right_op(vec, ARs, sig, I0, tr_sig, *, packer: Packer):
    Y = packer.unpack(vec)
    TY = Y
    for A in reversed(ARs):
        TY = transfer_right(TY, A, A)
    corr = pair_envs(sig, Y) / tr_sig
    return packer.pack(Y - TY + corr * I0)


def left_environments(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                      gl_final0: Optional[SymTensor] = None
                      ) -> Tuple[List[Dict[int, SymTensor]], jnp.ndarray]:
    """Left environments GLs[x] (bond left of site x) and energy/unit cell."""
    T = psi.T
    assert H.T == T
    ident = H.site.op("id")
    dtype = psi.ALs[0].dtype
    I0 = bond_identity(psi.group, psi.ALs[0].spaces[0], dtype=dtype)

    n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
    GL0: Dict[int, SymTensor] = {0: I0}
    for _ in range(n_sweeps):
        cur = dict(GL0)
        cur.pop(H.idx_final(0), None)  # FINAL handled by the linear solve
        for x in range(T):
            cur = mpo_transfer_left(cur, H.Ws[x], psi.ALs[x], psi.ALs[x], ident)
        cur[0] = I0
        cur.pop(H.idx_final(0), None)
        GL0 = cur

    # FINAL-channel inflow over one unit cell (start with FINAL = 0)
    cur = dict(GL0)
    for x in range(T):
        cur = mpo_transfer_left(cur, H.Ws[x], psi.ALs[x], psi.ALs[x], ident)
    CF = full_blocks(cur.get(H.idx_final(0), I0 * 0.0))

    rho = rho_right(psi.Cs[T - 1])
    tr_rho = pair_envs(I0, rho)
    e = pair_envs(CF, rho) / tr_rho

    packer = Packer(CF)
    ALt = tuple(psi.ALs)
    rhs = packer.pack(CF - e * I0)

    def mv(v):
        return _reg_left_op(v, ALt, rho, I0, tr_rho, packer=packer)

    x0 = packer.pack(gl_final0) if (
        gl_final0 is not None and Packer(full_blocks(gl_final0)) == packer) else None
    y, _info = gmres(mv, rhs, x0=x0, krylov_dim=30, tol=tol, max_restarts=20)
    GL0[H.idx_final(0)] = packer.unpack(y)

    GLs: List[Dict[int, SymTensor]] = [
        {a: full_blocks(t) for a, t in GL0.items()}]
    cur = GLs[0]
    for x in range(T - 1):
        cur = mpo_transfer_left(cur, H.Ws[x], psi.ALs[x], psi.ALs[x], ident)
        cur = {a: full_blocks(t) for a, t in cur.items()}
        GLs.append(cur)
    return GLs, e


def right_environments(psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                       gr_init0: Optional[SymTensor] = None
                       ) -> Tuple[List[Dict[int, SymTensor]], jnp.ndarray]:
    """Right environments GRs[x] (bond right of site x) and energy/unit cell."""
    T = psi.T
    ident = H.site.op("id")
    dtype = psi.ARs[0].dtype
    I0 = bond_identity(psi.group, psi.ARs[T - 1].spaces[2], dtype=dtype)
    fin0 = H.idx_final(0)

    n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
    GR0: Dict[int, SymTensor] = {fin0: I0}
    for _ in range(n_sweeps):
        cur = dict(GR0)
        cur.pop(0, None)  # INIT handled by the linear solve
        for x in reversed(range(T)):
            cur = mpo_transfer_right(cur, H.Ws[x], psi.ARs[x], psi.ARs[x], ident)
        cur[fin0] = I0
        cur.pop(0, None)
        GR0 = cur

    cur = dict(GR0)
    for x in reversed(range(T)):
        cur = mpo_transfer_right(cur, H.Ws[x], psi.ARs[x], psi.ARs[x], ident)
    CI = full_blocks(cur.get(0, I0 * 0.0))

    sig = rho_left(psi.Cs[T - 1])
    tr_sig = pair_envs(sig, I0)
    e = pair_envs(sig, CI) / tr_sig

    packer = Packer(CI)
    ARt = tuple(psi.ARs)
    rhs = packer.pack(CI - e * I0)

    def mv(v):
        return _reg_right_op(v, ARt, sig, I0, tr_sig, packer=packer)

    x0 = packer.pack(gr_init0) if (
        gr_init0 is not None and Packer(full_blocks(gr_init0)) == packer) else None
    y, _info = gmres(mv, rhs, x0=x0, krylov_dim=30, tol=tol, max_restarts=20)

    GR_bound = dict(GR0)
    GR_bound[0] = packer.unpack(y)
    GRs: List[Optional[Dict[int, SymTensor]]] = [None] * T
    GRs[T - 1] = {a: full_blocks(t) for a, t in GR_bound.items()}
    cur = GRs[T - 1]
    for x in reversed(range(1, T)):
        cur = mpo_transfer_right(cur, H.Ws[x], psi.ARs[x], psi.ARs[x], ident)
        cur = {a: full_blocks(t) for a, t in cur.items()}
        GRs[x - 1] = cur
    return GRs, e


class Environments:
    """Bundled left/right environments with the unit-cell energy."""

    def __init__(self, psi: UniformMPS, H: MPOHamiltonian, tol: float = 1e-12,
                 prev: "Environments" = None):
        gl0 = prev.GLs[0].get(H.idx_final(0)) if prev is not None else None
        gr0 = prev.GRs[psi.T - 1].get(0) if prev is not None else None
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
