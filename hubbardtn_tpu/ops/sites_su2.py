"""SU(2)-symmetric local site algebras for Hubbard models.

Genuine non-abelian counterpart of :mod:`ops.sites`, matching the
reference's default symmetry setting (fZ2 x SU2 x U1 spaces,
/root/reference/src/HubbardFunctions.jl:245-255; grand-canonical fZ2 x SU2
variant :341-346).

A local operator is a 2-leg charged FusionTensor (p OUT, p IN) whose hidden
charge M-axis enumerates the tensor-operator multiplet components (e.g. the
c-dagger doublet).  The *operator basis* helper enumerates an orthonormal
basis of irreducible tensor operators per charge sector — the raw material
for the automatic SU(2) symmetrization of abelian (Jordan-Wigner-compiled)
term lists in mpo/su2_compile.py.

Dense basis convention |0>, |up>, |down>, |updown> matches ops/sites.py;
the SU(2) dense layout orders sector slices by sorted sector with the
doublet slice as (m=-1/2, m=+1/2) = (|down>, |up>).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import (FERMION_SU2, FERMION_SU2_CHARGE, AbelianGroup,
                               Sector)
from ..symmetry.spaces import Space
from ..tensor.fusion import IN, OUT, FusionTensor


@dataclass(frozen=True)
class SU2Site:
    """Local Hilbert space with scalar operator algebra + tensor-op basis.

    ops maps name -> (operator FusionTensor, fermionic parity); only SU(2)
    scalars get names (id, Z, n, docc) — charged multiplets live in the
    operator basis used by the MPO symmetrizer."""

    group: AbelianGroup
    space: Space
    ops: Dict[str, Tuple[FusionTensor, int]] = field(hash=False)
    # permutation: dense index in |0>,|up>,|down>,|updown> order -> SU2 layout
    perm: Tuple[int, ...] = field(hash=False, default=())

    def op(self, name: str) -> FusionTensor:
        return self.ops[name][0]

    def parity(self, name: str) -> int:
        return self.ops[name][1]

    def to_su2_layout(self, dense_4x4: np.ndarray) -> np.ndarray:
        """Re-order a |0>,|up>,|down>,|updown>-basis matrix into the SU(2)
        dense layout."""
        P = np.zeros((len(self.perm), len(self.perm)))
        for new, old in enumerate(self.perm):
            P[new, old] = 1.0
        return P @ dense_4x4 @ P.T


def _fermion_dense():
    cu = np.zeros((4, 4))
    cu[0, 1] = 1.0
    cu[2, 3] = 1.0
    cd = np.zeros((4, 4))
    cd[0, 2] = 1.0
    cd[1, 3] = -1.0
    nup = cu.T @ cu
    ndn = cd.T @ cd
    return {
        "id": np.eye(4),
        "Z": np.diag([1.0, -1.0, -1.0, 1.0]),
        "n": nup + ndn,
        "docc": nup @ ndn,
    }


def _layout_perm(space: Space, doublet: Sector, singlets: Dict[Sector, List[int]]):
    """Dense layout permutation: for each sorted sector, the basis indices
    (in |0>,|up>,|down>,|updown> numbering) that fill its dense slice, with
    the doublet as (down, up) = m ascending."""
    order: List[int] = []
    for s, _ in space:
        if s == doublet:
            order.extend([2, 1])  # |down>, |up>
        else:
            order.extend(singlets[s])
    return tuple(order)


def _scalar_ops(group, space, perm):
    dense = _fermion_dense()
    P = np.zeros((4, 4))
    for new, old in enumerate(perm):
        P[new, old] = 1.0
    out = {}
    for name, mat in dense.items():
        t = FusionTensor.from_dense(group, (space, space), (OUT, IN),
                                    P @ mat @ P.T, charge=None)
        out[name] = (t, 0)
    return out


def canonical_su2_site(P: int, Q: int) -> SU2Site:
    """Fixed-filling SU(2) site: sectors (parity, 2j, Q*n - P); mirrors the
    reference space at src/HubbardFunctions.jl:248."""
    g = FERMION_SU2_CHARGE
    sec0 = (0, 0, -P)
    sec1 = (1, 1, Q - P)
    sec2 = (0, 0, 2 * Q - P)
    space = Space(g, {sec0: 1, sec1: 1, sec2: 1})
    perm = _layout_perm(space, sec1, {sec0: [0], sec2: [3]})
    return SU2Site(g, space, _scalar_ops(g, space, perm), perm)


def grand_su2_site() -> SU2Site:
    """Grand-canonical SU(2) site: fZ2 x SU2 with a 2-dimensional trivial
    sector {|0>, |updown>} (reference :341-346)."""
    g = FERMION_SU2
    sec0 = (0, 0)
    sec1 = (1, 1)
    space = Space(g, {sec0: 2, sec1: 1})
    perm = _layout_perm(space, sec1, {sec0: [0, 3]})
    return SU2Site(g, space, _scalar_ops(g, space, perm), perm)


# ----------------------------------------------------------------------
# irreducible tensor-operator basis
# ----------------------------------------------------------------------

@dataclass(frozen=True)
class BasisOp:
    """One irreducible tensor operator: charge + fingerprint + tensors."""

    charge: Sector
    fingerprint: Tuple          # hashable identity (bkey + unit position)
    parity: int                 # fermionic parity (= charge[0])

    def __hash__(self):
        return hash((self.charge, self.fingerprint))


_BASIS_CACHE: Dict = {}


def op_basis(site: SU2Site):
    """Orthonormal basis of irreducible tensor operators on the site,
    grouped by charge: returns dict charge -> list of (BasisOp,
    FusionTensor, dense (d, d, qdim) array)."""
    key = site.space
    hit = _BASIS_CACHE.get(key)
    if hit is not None:
        return hit
    g = site.group
    sp = site.space
    charges = set()
    for qo, _ in sp:
        for qi, _ in sp:
            charges.update(g.fuse_outcomes(qo, g.dual(qi)))
    out: Dict[Sector, list] = {}
    for c in sorted(charges):
        t0 = FusionTensor.zeros(g, (sp, sp), (OUT, IN), charge=c, fill=False)
        elems = []
        for bk in t0.allowed_keys():
            shape = t0.key_shape(bk)
            for i in range(shape[0]):
                for j in range(shape[1]):
                    blk = np.zeros(shape)
                    blk[i, j] = 1.0
                    t = FusionTensor(g, (sp, sp), (OUT, IN),
                                     {bk: jnp.asarray(blk)}, c, None)
                    dense = t.to_dense()
                    if dense.ndim == 2:
                        dense = dense[..., None]
                    op = BasisOp(c, (bk, i, j), c[0] % 2)
                    elems.append((op, t, dense))
        if elems:
            out[c] = elems
    _BASIS_CACHE[key] = out
    return out


# ----------------------------------------------------------------------
# channel attachment (MPO W tensors with explicit channel legs)
# ----------------------------------------------------------------------

def channel_space(group, q: Sector) -> Space:
    return Space(group, {q: 1})


_COUPLER_CACHE: Dict = {}


def coupler(group, qa: Sector, c: Sector, qb: Sector) -> np.ndarray:
    """Dense (qdim_a, qdim_c, qdim_b) array of the canonical channel
    coupler: the unique neutral FusionTensor with legs (ch_a OUT qa,
    aux OUT c, ch_b IN qb), unit block.  The aux axis pairs the hidden
    M-axis of a charge-c operator (which transforms as a *bra* of rep c,
    so a plain sum against an OUT-leg ket index is the invariant pairing).
    Engine-canonical up to a scale absorbed by term calibration."""
    key = (group, qa, c, qb)
    hit = _COUPLER_CACHE.get(key)
    if hit is not None:
        return hit
    K = FusionTensor.zeros(group,
                           (channel_space(group, qa), channel_space(group, c),
                            channel_space(group, qb)),
                           (OUT, OUT, IN), fill=False)
    keys = K.allowed_keys()
    if not keys:
        raise ValueError(f"no intertwiner {qa} x {c} -> {qb}")
    assert len(keys) == 1, "SU(2) fusion must be multiplicity-free"
    K.blocks[keys[0]] = jnp.ones((1, 1, 1))
    D = K.to_dense()
    D = np.asarray(D)
    _COUPLER_CACHE[key] = D
    return D


def attach_channels(group, op_dense: np.ndarray, phys: Space,
                    qa: Sector, c: Sector, qb: Sector) -> FusionTensor:
    """4-leg MPO piece (ch_a OUT, p OUT, p IN, ch_b IN) from a charged
    operator's dense (d, d, qdim_c) array.  Channel conventions (neutral
    everywhere): GL[a] = (bra IN, ket OUT, ch IN qa); W = this tensor;
    GR[b] = (ket IN, bra OUT, ch OUT qb)."""
    K = coupler(group, qa, c, qb)                 # (ma, M, mb)
    dense = np.einsum("pqM,aMb->apqb", op_dense, K)
    return FusionTensor.from_dense(
        group,
        (channel_space(group, qa), phys, phys, channel_space(group, qb)),
        (OUT, OUT, IN, IN), dense, charge=None)
