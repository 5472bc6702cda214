"""Bucketed Newton-Schulz polar gauge update.

The VUMPS gauge step AL = Q(AC) Q(C)^dag (algorithms/vumps.gauge_from_AC_C)
needs only the ISOMETRY factors of AC and C.  On TPU, per-block Householder
QR lowers to sequential custom calls that dominate the iteration (~20 ms of
a 44 ms chi~2752 iteration, bench.py round 2), while the polar factor can be
computed with matmuls alone: the Newton-Schulz iteration

    U <- 1.5 U - 0.5 U (U^dag U),   U_0 = X / ||X||_F

converges to the orthogonal polar factor for every singular direction
(s -> 1.5 s - 0.5 s^3).  The original VUMPS formulation (PRB 97, 045145)
uses exactly these polar gauges; MPSKit's QRpos is an equivalent choice.

TPU-native structure: all per-sector matrices are bucketed into pow2 shape
classes (same scheme as algorithms/batched_hac.py) so the whole NS
recurrence is a few dozen batched einsums on the MXU instead of thousands
of tiny sequential factorizations.  Zero padding is exact: pad rows/cols
stay identically zero through the iteration.  Wide blocks (rows < cols,
rare transients) fall back to per-block QR.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..mps.imps import absorb_bond_left, absorb_bond_right
from ..symmetry.spaces import Space
from ..tensor.linalg import (_left_factor, _pos_diag, _right_factor,
                             matricize)
from ..tensor.symtensor import SymTensor, tensordot


def _bucket(d: int) -> int:
    b = 8
    while b < d:
        b *= 2
    return b


def _ns_polar_stack(X: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Newton-Schulz polar factor of a (n, R, C) stack with R >= C."""
    nrm = jnp.sqrt(jnp.sum(jnp.abs(X) ** 2, axis=(1, 2), keepdims=True))
    U = X / jnp.maximum(nrm, 1e-30)

    def body(_, U):
        G = jnp.einsum("bij,bik->bjk", jnp.conj(U), U)
        return 1.5 * U - 0.5 * jnp.einsum("bij,bjk->bik", U, G)

    return lax.fori_loop(0, iters, body, U)


class _PolarSide:
    """Static plan for the isometry factor of one matricization."""

    def __init__(self, template: SymTensor, nrows: int, right: bool,
                 iters: int):
        self.nrows = nrows
        self.right = right
        self.iters = iters
        # shape discovery on the host device: eager block writes on a
        # remote-TPU default device would cost one RPC each
        with jax.default_device(jax.devices("cpu")[0]):
            mats, rowinfo, colinfo = matricize(full_like_zero(template),
                                               nrows)
        self.sectors = sorted(mats.keys())
        self.shapes = {r: tuple(mats[r].shape) for r in self.sectors}
        # orientation: left isometry wants tall (rows >= cols); right
        # isometry wants wide, handled by transposing into the NS stack
        self.classes: Dict[Tuple[int, int], list] = defaultdict(list)
        self.fallback = []
        for r in self.sectors:
            R, C = self.shapes[r]
            a, b = (C, R) if right else (R, C)
            if a >= b:
                self.classes[(_bucket(a), _bucket(b))].append(r)
            else:
                self.fallback.append(r)
        self.class_keys = sorted(self.classes.keys())
        bond = {}
        for r in self.sectors:
            R, C = self.shapes[r]
            bond[r] = min(R, C)
        self.bond_space_dims = bond

    def factor(self, T: SymTensor):
        """Isometry factor as a SymTensor ((rows..., bond) for left,
        (bond, cols...) for right)."""
        mats, rowinfo, colinfo = matricize(T, self.nrows)

        def mat_of(r):
            m = mats.get(r)
            if m is None:
                m = jnp.zeros(self.shapes[r], dtype=T.dtype)
            return m

        Qs: Dict = {}
        for ck in self.class_keys:
            rs = self.classes[ck]
            X = jnp.zeros((len(rs),) + ck, dtype=T.dtype)
            for i, r in enumerate(rs):
                m = mat_of(r)
                if self.right:
                    m = jnp.swapaxes(jnp.conj(m), 0, 1)
                X = X.at[i, :m.shape[0], :m.shape[1]].set(m)
            U = _ns_polar_stack(X, self.iters)
            for i, r in enumerate(rs):
                R, C = self.shapes[r]
                if self.right:
                    Qs[r] = jnp.swapaxes(jnp.conj(U[i, :C, :R]), 0, 1)
                else:
                    Qs[r] = U[i, :R, :C]
        for r in self.fallback:  # wide-for-left / tall-for-right transients
            m = mat_of(r)
            if self.right:
                qt, rt = jnp.linalg.qr(jnp.conj(m.T), mode="reduced")
                qt, _ = _pos_diag(qt, rt)
                Qs[r] = jnp.conj(qt.T)
            else:
                q, rr = jnp.linalg.qr(m, mode="reduced")
                q, _ = _pos_diag(q, rr)
                Qs[r] = q
        bond_space = Space(T.group, {r: (Qs[r].shape[0] if self.right
                                         else Qs[r].shape[1])
                                     for r in Qs})
        if self.right:
            return _right_factor(T, self.nrows, colinfo, Qs, bond_space)
        return _left_factor(T, self.nrows, rowinfo, Qs, bond_space)


def full_like_zero(t: SymTensor) -> SymTensor:
    """Template with the complete allowed-block table (host, cheap)."""
    z = type(t).zeros(t.group, t.spaces, t.arrows, t.charge, t.dtype)
    return z + t


class PolarGaugePlan:
    """Per-site bucketed polar gauge: (AC, C_left, C_right) -> (AL, AR,
    gauge errors).  Hashable on the static block structures so the whole
    update jits as one program."""

    def __init__(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor,
                 iters: int = 30):
        self.p_ac2 = _PolarSide(AC, 2, right=False, iters=iters)
        self.p_cr = _PolarSide(Cr, 1, right=False, iters=iters)
        self.p_ac1 = _PolarSide(AC, 1, right=True, iters=iters)
        self.p_cl = _PolarSide(Cl, 1, right=True, iters=iters)
        self._sig = (AC.structure(), Cl.structure(), Cr.structure(), iters)

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return (isinstance(other, PolarGaugePlan)
                and self._sig == other._sig)

    def apply(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor):
        QAC = self.p_ac2.factor(AC)                    # (vl, p, b)
        QCr = self.p_cr.factor(Cr)                     # (vr, b)
        AL = tensordot(QAC, QCr.conj(), axes=([2], [1]))
        QACr = self.p_ac1.factor(AC)                   # (b, p, vr)
        QCl = self.p_cl.factor(Cl)                     # (b, vl)
        AR = tensordot(QCl.conj(), QACr, axes=([0], [0]))
        dl = (AC - absorb_bond_right(AL, Cr)).norm()
        dr = (AC - absorb_bond_left(Cl, AR)).norm()
        return AL, AR, dl, dr


@partial(jax.jit, static_argnames=("plan",))
def gauge_site_polar(AC: SymTensor, Cl: SymTensor, Cr: SymTensor, *,
                     plan: PolarGaugePlan):
    """Jitted bucketed polar gauge update for one site."""
    return plan.apply(AC, Cl, Cr)
