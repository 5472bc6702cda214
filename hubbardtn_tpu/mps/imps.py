"""Uniform (infinite) MPS with a unit cell, in mixed canonical gauge.

TPU-native equivalent of MPSKit's ``InfiniteMPS`` (reference call sites:
/root/reference/src/HubbardFunctions.jl:917-991 construction, :1010-1027
ground-state drivers).  All block tables are static Python metadata; the
tensors are :class:`SymTensor` pytrees, so whole algorithm steps jit.

Leg and arrow conventions (see tensor/symtensor.py for arrow semantics):

* ket tensor ``A[vl, p, vr]`` has arrows ``(IN, OUT, OUT)`` and trivial
  charge, so the bond sector label is (minus) the accumulated physical
  charge and ``matricize(A, 2)`` / ``qr`` produce MPS-shaped factors
  directly.
* bond matrices ``C[l, r]`` have arrows ``(IN, OUT)``.
* ``C[x]`` lives on the bond *right* of site ``x``; the mixed-gauge
  relations are ``AC[x] = AL[x] @ C[x] = C[x-1] @ AR[x]``.

Gauging is by iterated QR/LQ sweeps over the unit cell (the standard
uniform-MPS orthonormalization; tangent-space review algorithm 1/2),
host-driven because bond sector structures may shrink when rank-deficient.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import AbelianGroup, Sector
from ..symmetry.spaces import Space, fuse_many, one
from ..tensor import linalg as tla
from ..tensor.symtensor import IN, OUT, SymTensor, tensordot, trace_all

from ..utils.device import host_built

def _tensor_cls(group):
    if getattr(group, "has_su2", False):
        from ..tensor.fusion import FusionTensor
        return FusionTensor
    return SymTensor


def mps_tensor_random(group, vl: Space, p: Space, vr: Space, dtype=jnp.float64,
                      seed: int = 0) -> SymTensor:
    return _tensor_cls(group).random(group, (vl, p, vr), (IN, OUT, OUT),
                                     dtype=dtype, seed=seed)


def bond_identity(group, v: Space, dtype=jnp.float64) -> SymTensor:
    if getattr(group, "has_su2", False):
        from ..tensor.fusion_linalg import bond_identity as su2_bond_identity
        return su2_bond_identity(group, v, dtype=dtype)
    blocks = {(q, q): jnp.eye(d, dtype=dtype) for q, d in v}
    return SymTensor(group, (v, v), (IN, OUT), blocks, group.trivial, dtype)


def absorb_bond_left(C: SymTensor, A: SymTensor) -> SymTensor:
    """C @ A: contract C's right leg with A's left leg -> MPS tensor."""
    return tensordot(C, A, axes=([1], [0]))


def absorb_bond_right(A: SymTensor, C: SymTensor) -> SymTensor:
    """A @ C: contract A's right leg with C's left leg -> MPS tensor."""
    return tensordot(A, C, axes=([2], [0]))


def normalize_tensor(T: SymTensor) -> SymTensor:
    return T * (1.0 / T.norm())


# ----------------------------------------------------------------------
# orthonormalization sweeps
# ----------------------------------------------------------------------

@jax.jit
def _qr_step(C: SymTensor, A: SymTensor):
    """One left-gauging move: QR of (C A).  Jitted; cache keyed on structure."""
    Q, R = tla.qr(absorb_bond_left(C, A), 2)
    return Q, R * (1.0 / R.norm())


@jax.jit
def _lq_step(A: SymTensor, C: SymTensor):
    """One right-gauging move: LQ of (A C)."""
    L, Q = tla.lq(absorb_bond_right(A, C), 1)
    return L * (1.0 / L.norm()), Q


def left_orthonormalize(As: Sequence[SymTensor], tol: float = 1e-12,
                        maxiter: int = 200) -> Tuple[List[SymTensor], SymTensor]:
    """Find AL[x] and C with  C_prev[x-1] A[x] = AL[x] C[x]  (unit cell
    periodic), AL left-isometric.  Returns (ALs, C[T-1] = cell-boundary C)."""
    T = len(As)
    group = As[0].group
    C = bond_identity(group, As[0].spaces[0], dtype=As[0].dtype)
    C = C * (1.0 / C.norm())
    last = None
    for _ in range(maxiter):
        ALs = []
        for x in range(T):
            AL, C = _qr_step(C, As[x])
            ALs.append(AL)
        # convergence: boundary C stable (up to block table changes)
        if last is not None and last.structure() == C.structure():
            diff = (C - last).norm()
            if float(diff) < tol:
                return ALs, C
        last = C
    return ALs, C


def right_orthonormalize(As: Sequence[SymTensor], tol: float = 1e-12,
                         maxiter: int = 200) -> Tuple[List[SymTensor], SymTensor]:
    """Find AR[x] and C with  A[x] C[x] = C[x-1] AR[x], AR right-isometric.
    Returns (ARs, C at the cell boundary = bond right of site T-1)."""
    T = len(As)
    group = As[0].group
    C = bond_identity(group, As[-1].spaces[2], dtype=As[0].dtype)
    C = C * (1.0 / C.norm())
    last = None
    for _ in range(maxiter):
        ARs = [None] * T
        for x in reversed(range(T)):
            C, AR = _lq_step(As[x], C)
            ARs[x] = AR
        if last is not None and last.structure() == C.structure():
            diff = (C - last).norm()
            if float(diff) < tol:
                return ARs, C
        last = C
    return ARs, C


@dataclass
class UniformMPS:
    """Mixed-gauge uniform MPS over a unit cell of T sites.

    ALs[x]: left-isometric tensors;  ARs[x]: right-isometric;
    Cs[x]: bond matrix on the bond right of site x (so Cs[T-1] is the
    cell boundary);  AC[x] = ALs[x] Cs[x] = Cs[x-1] ARs[x].
    """

    ALs: List[SymTensor]
    ARs: List[SymTensor]
    Cs: List[SymTensor]

    @property
    def T(self) -> int:
        return len(self.ALs)

    @property
    def group(self):
        return self.ALs[0].group

    def AC(self, x: int) -> SymTensor:
        return absorb_bond_right(self.ALs[x], self.Cs[x])

    def bond_space(self, x: int) -> Space:
        """Space of the bond right of site x (= left of site x+1)."""
        return self.Cs[x % self.T].spaces[0]

    def bond_dims(self) -> List[int]:
        return [self.bond_space(x).total_dim for x in range(self.T)]

    def entanglement_spectrum(self, x: int) -> Dict[Sector, np.ndarray]:
        """Schmidt values per sector at the bond right of site x."""
        _, ss, _, _ = tla.svd(self.Cs[x % self.T], 1)
        return {q: np.asarray(s) for q, s in ss.items()}

    def gauge_error(self) -> float:
        """max_x || AL[x] C[x] - C[x-1] AR[x] ||."""
        err = 0.0
        for x in range(self.T):
            lhs = self.AC(x)
            rhs = absorb_bond_left(self.Cs[(x - 1) % self.T], self.ARs[x])
            err = max(err, float((lhs - rhs).norm()))
        return err


def mixed_gauge(As: Sequence[SymTensor], tol: float = 1e-12) -> UniformMPS:
    """Bring an arbitrary unit-cell MPS into mixed canonical form."""
    ALs, _ = left_orthonormalize(As, tol)
    ARs, Cb = right_orthonormalize(ALs, tol)
    # Cb is the boundary bond matrix (right of site T-1).  Recover interior
    # Cs by sweeping: C[x] = C[x-1] AR[x] absorbed against AL[x]... simpler:
    # C[x-1] AR[x] = AL[x] C[x]  =>  C[x] = AL[x]^dag C[x-1] AR[x].
    T = len(As)
    Cs: List[Optional[SymTensor]] = [None] * T
    Cs[T - 1] = Cb * (1.0 / Cb.norm())
    for x in range(T - 1):
        prev = Cs[(x - 1) % T]
        M = absorb_bond_left(prev, ARs[x])          # (vl, p, vr)
        ALbar = ALs[x].conj()                       # (vl OUT, p IN, vr IN)
        C = tensordot(ALbar, M, axes=([0, 1], [0, 1]))  # (vr_bar IN, vr OUT)
        Cs[x] = C * (1.0 / C.norm())
    return UniformMPS(ALs, ARs, Cs)


# ----------------------------------------------------------------------
# initial-state construction (reference initialize_mps, :917-991)
# ----------------------------------------------------------------------

def virtual_spaces(group, phys: Space, T: int, bond_dim: int,
                   cells: int = 1) -> List[Space]:
    """Bond spaces V[x] (left of site x): sector-wise minimum of the forward
    physical fusion (over ``cells`` extra unit cells) and the dual backward
    fusion, each multiplicity capped at ``bond_dim`` — the analog of the
    reference's accumulate/infimum/Vmax construction (:922-948)."""
    F = [one(group)]
    for _ in range(cells * T + T):
        F.append(F[-1].fuse(phys))
    Vs = []
    for x in range(T):
        # flux rule q_vr = q_vl - q_p: the bond left of site x carries the
        # DUAL of the fused physical charge accumulated from the left, and
        # must be completable by the remaining sites to the right
        fwd = F[cells * T + x].dual()
        bwd = F[cells * T + (T - x)]
        Vs.append(fwd.infimum(bwd).cap(bond_dim))
    return Vs


@host_built
def initialize_mps(group, phys: Space, T: int, bond_dim: int,
                   dtype=jnp.float64, seed: int = 0, cells: int = 1,
                   tol: float = 1e-10) -> UniformMPS:
    """Random uniform MPS in mixed gauge.  AL tensors are built directly as
    random isometries per sector (cheap: no left-gauging sweeps), then
    right-orthonormalized."""
    Vs = virtual_spaces(group, phys, T, bond_dim, cells)
    ALs: List[SymTensor] = []
    # iterate until periodic bond spaces stabilize under QR shrinkage
    for _pass in range(8):
        stable = tuple(Vs)
        ALs = []
        for x in range(T):
            vl, vr = Vs[x], Vs[(x + 1) % T]
            A = mps_tensor_random(group, vl, phys, vr, dtype=dtype,
                                  seed=seed + 31 * _pass + x)
            Q, _ = tla.qr(A, 2)
            Vs[(x + 1) % T] = Q.spaces[2]
            ALs.append(Q)
        if tuple(Vs) == stable:
            break
    ARs, Cb = right_orthonormalize(ALs, tol)
    T_ = len(ALs)
    Cs: List[Optional[SymTensor]] = [None] * T_
    Cs[T_ - 1] = Cb * (1.0 / Cb.norm())
    for x in range(T_ - 1):
        prev = Cs[(x - 1) % T_]
        M = absorb_bond_left(prev, ARs[x])
        C = tensordot(ALs[x].conj(), M, axes=([0, 1], [0, 1]))
        Cs[x] = C * (1.0 / C.norm())
    return UniformMPS(ALs, ARs, Cs)


# ----------------------------------------------------------------------
# transfer operators (no MPO)
# ----------------------------------------------------------------------

def circshift_mps(psi: UniformMPS, shift: int) -> UniformMPS:
    """Translate the unit cell by ``shift`` sites (reference ``circshift``
    at src/HubbardFunctions.jl:1204, used for domain-wall kets)."""
    T = psi.T
    s = shift % T
    return UniformMPS([psi.ALs[(x + s) % T] for x in range(T)],
                      [psi.ARs[(x + s) % T] for x in range(T)],
                      [psi.Cs[(x + s) % T] for x in range(T)])


def transfer_left(X: SymTensor, A: SymTensor, Abar_of: SymTensor) -> SymTensor:
    """X'[b',k'] = sum_{b,k,p} X[b,k] A[k,p,k'] conj(B)[b,p,b'].

    X legs (bra IN, ket OUT); A the ket tensor; Abar_of the *ket-form*
    tensor whose conjugate is contracted on the bra side.  A 3-leg X
    (bra IN, ket OUT, channel) passes the dangling channel leg through."""
    B = Abar_of.conj()                               # (vl OUT, p IN, vr IN)
    if X.ndim == 3:
        Y = tensordot(X, A, axes=([1], [0]))         # (b, ch, p, k')
        Z = tensordot(B, Y, axes=([0, 1], [0, 2]))   # (b', ch, k')
        return Z.transpose((0, 2, 1))                # (b', k', ch)
    Y = tensordot(X, A, axes=([1], [0]))            # (b, p, k')
    return tensordot(B, Y, axes=([0, 1], [0, 1]))    # (b' IN, k' OUT)


def transfer_right(X: SymTensor, A: SymTensor, Abar_of: SymTensor) -> SymTensor:
    """X'[k',b'] = sum_{k,b,p} A[k',p,k] X[k,b] conj(B)[b',p,b].

    X legs (ket IN, bra OUT); a 3-leg X passes its channel leg through."""
    B = Abar_of.conj()
    if X.ndim == 3:
        Y = tensordot(A, X, axes=([2], [0]))         # (k', p, b, ch)
        Z = tensordot(Y, B, axes=([1, 2], [1, 2]))   # (k', ch, b')
        return Z.transpose((0, 2, 1))                # (k', b', ch)
    Y = tensordot(A, X, axes=([2], [0]))             # (k', p, b)
    return tensordot(Y, B, axes=([1, 2], [1, 2]))    # (k' IN, b' OUT)


def expectation_local(psi: UniformMPS, x: int, op: SymTensor) -> jnp.ndarray:
    """<psi| op_x |psi> for a single-site operator (trivial charge)."""
    AC = psi.AC(x % psi.T)
    OAC = tensordot(op, AC, axes=([1], [1]))         # (p_out, vl, vr)
    OAC = OAC.transpose((1, 0, 2))
    num = AC.conj()
    val = tensordot(num, OAC, axes=([0, 1, 2], [0, 1, 2]))
    return val.scalar()
