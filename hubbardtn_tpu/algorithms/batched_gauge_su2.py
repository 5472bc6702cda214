"""Bucketed Newton-Schulz polar gauge for the SU(2) fusion backend.

SU(2) counterpart of :mod:`algorithms.batched_gauge`: the gauge step needs
only the isometry factors of AC and C, and on TPU the per-coupled-sector
Householder QRs of the fusion matricization (~4 sides x ~30 sectors of
sequential custom calls, ~22 ms of an 88 ms chi~2874 iteration, bench.py
round 2) are replaced by a JOINT bucketed Newton-Schulz chain — pure
batched matmuls on the MXU.

The fusion matricization itself (two structure-isometry contractions per
side, tensor/fusion_linalg.matricize) and the factor reassembly stay as
traced per-block GEMMs: they are cheap matmuls, and their scalar
conventions (mat_coeff for matrix-like left factors, the +-1/sqrt(qdim)
pairing split that makes lq's right factor dense-isometric,
fusion_linalg.qr/lq) are reused verbatim, so the polar factors carry
exactly the same structural normalization as the QR/LQ factors they
replace.  Wide sectors (rows < cols in tall orientation, transients only)
fall back to per-sector QR.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mps.imps import absorb_bond_left, absorb_bond_right
from ..symmetry.spaces import Space
from ..tensor.fusion import FusionTensor
from ..tensor.fusion_linalg import (_left_factor, _pos_diag, _right_factor,
                                    matricize)
from ..tensor.symtensor import tensordot
from .batched_gauge import _bucket, _norm_schedule, _ns_polar_stack


def _full_zero(t: FusionTensor) -> FusionTensor:
    return FusionTensor.zeros(t.group, t.spaces, t.arrows, t.charge,
                              t.dtype)


class _SideMetaSU2:
    """Static metadata of one fusion matricization side."""

    __slots__ = ("nrows", "right", "sectors", "shapes", "fallback")

    def __init__(self, template: FusionTensor, nrows: int, right: bool):
        self.nrows = nrows
        self.right = right
        with jax.default_device(jax.devices("cpu")[0]):
            mats, _fr, _fc, _br, _bc = matricize(_full_zero(template), nrows)
        self.sectors = sorted(mats.keys())
        self.shapes = {r: tuple(mats[r].shape) for r in self.sectors}
        self.fallback = []
        for r in self.sectors:
            R, C = self.shapes[r]
            a, b = (C, R) if right else (R, C)
            if a < b:
                self.fallback.append(r)

    def tall_shape(self, r):
        R, C = self.shapes[r]
        return (C, R) if self.right else (R, C)

    def _sig(self):
        return (self.nrows, self.right, tuple(self.sectors),
                tuple(sorted(self.shapes.items())))


class PolarGaugePlanSU2:
    """Per-site bucketed SU(2) polar gauge: (AC, C_left, C_right) ->
    (AL, AR, gauge errors), one jitted program per block structure."""

    SIDES = ("ac2", "cr", "ac1", "cl")

    def __init__(self, AC: FusionTensor, Cl: FusionTensor, Cr: FusionTensor,
                 iters="express"):
        self.iters = _norm_schedule(iters)
        self.meta = {
            "ac2": _SideMetaSU2(AC, 2, right=False),
            "cr": _SideMetaSU2(Cr, 1, right=False),
            "ac1": _SideMetaSU2(AC, 1, right=True),
            "cl": _SideMetaSU2(Cl, 1, right=True),
        }
        self.classes: Dict[Tuple[int, int], list] = defaultdict(list)
        self.pos: Dict = {}
        for side in self.SIDES:
            m = self.meta[side]
            for r in m.sectors:
                if r in m.fallback:
                    continue
                a, b = m.tall_shape(r)
                ck = (_bucket(a), _bucket(b))
                self.pos[(side, r)] = (ck, len(self.classes[ck]))
                self.classes[ck].append((side, r))
        self.class_keys = sorted(self.classes.keys())
        self._sig = (tuple((s, self.meta[s]._sig()) for s in self.SIDES),
                     self.iters)

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return (isinstance(other, PolarGaugePlanSU2)
                and self._sig == other._sig)

    # -- core -------------------------------------------------------------
    def _factors(self, tensors: Dict[str, FusionTensor]):
        g = tensors["ac2"].group
        mats = {}
        infos = {}
        for side in self.SIDES:
            m = self.meta[side]
            mm, fr, fc, br, bc = matricize(tensors[side], m.nrows)
            mats[side] = mm
            infos[side] = (fr, fc, br, bc)

        def mat_of(side, r):
            m = mats[side].get(r)
            if m is None:
                m = jnp.zeros(self.meta[side].shapes[r],
                              dtype=tensors[side].dtype)
            return m

        dtype = tensors["ac2"].dtype
        Qs: Dict[str, Dict] = {side: {} for side in self.SIDES}
        for ck in self.class_keys:
            entries = self.classes[ck]
            X = jnp.zeros((len(entries),) + ck, dtype=dtype)
            for i, (side, r) in enumerate(entries):
                m = mat_of(side, r)
                if self.meta[side].right:
                    m = jnp.swapaxes(jnp.conj(m), 0, 1)
                X = X.at[i, :m.shape[0], :m.shape[1]].set(m)
            U = _ns_polar_stack(X, self.iters)
            for i, (side, r) in enumerate(entries):
                R, C = self.meta[side].shapes[r]
                if self.meta[side].right:
                    # lq convention (fusion_linalg.lq): the right factor
                    # carries sqrt(qdim) so its dense rows are orthonormal
                    Qs[side][r] = jnp.swapaxes(
                        jnp.conj(U[i, :C, :R]), 0, 1) * float(
                            np.sqrt(g.qdim(r)))
                else:
                    Qs[side][r] = U[i, :R, :C]
        for side in self.SIDES:
            m = self.meta[side]
            for r in m.fallback:
                blk = mat_of(side, r)
                if m.right:
                    qt, rt = jnp.linalg.qr(jnp.conj(blk.T), mode="reduced")
                    qt, _ = _pos_diag(qt, rt)
                    Qs[side][r] = jnp.conj(qt.T) * float(np.sqrt(g.qdim(r)))
                else:
                    q, rr = jnp.linalg.qr(blk, mode="reduced")
                    q, _ = _pos_diag(q, rr)
                    Qs[side][r] = q

        out = {}
        for side in self.SIDES:
            m = self.meta[side]
            fr, fc, br, bc = infos[side]
            T = tensors[side]
            bond = Space(g, {r: (Qs[side][r].shape[0] if m.right
                                 else Qs[side][r].shape[1])
                             for r in Qs[side]})
            if m.right:
                out[side] = _right_factor(T, m.nrows, fc, bc, Qs[side],
                                          bond)
            else:
                out[side] = _left_factor(T, m.nrows, fr, br, Qs[side],
                                         bond)
        return out

    def apply(self, AC: FusionTensor, Cl: FusionTensor, Cr: FusionTensor):
        F = self._factors({"ac2": AC, "cr": Cr, "ac1": AC, "cl": Cl})
        AL = tensordot(F["ac2"], F["cr"].conj(), axes=([2], [1]))
        AR = tensordot(F["cl"].conj(), F["ac1"], axes=([0], [0]))
        dl = (AC - absorb_bond_right(AL, Cr)).norm()
        dr = (AC - absorb_bond_left(Cl, AR)).norm()
        return AL, AR, dl, dr


@partial(jax.jit, static_argnames=("plan",))
def gauge_site_polar_su2(AC: FusionTensor, Cl: FusionTensor,
                         Cr: FusionTensor, *, plan: PolarGaugePlanSU2):
    """Jitted bucketed SU(2) polar gauge update for one site."""
    return plan.apply(AC, Cl, Cr)
