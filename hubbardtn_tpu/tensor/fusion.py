"""Fusion-tree tensors: block-sparse tensors with one SU(2) factor.

Non-abelian counterpart of :mod:`hubbardtn_tpu.tensor.symtensor`, providing
the genuine SU(2) spin symmetry of the reference's default setting
(fZ2 x SU2 x U1 spaces at /root/reference/src/HubbardFunctions.jl:245-255;
TensorKit supplies the fusion-tree machinery there, SURVEY.md section 2B).

Representation
--------------
A block is keyed by ``(leg_sectors, charge_sector, tree)``:

* ``leg_sectors`` — one sector per visible leg (like the abelian keys);
* ``charge_sector`` — the tensor may carry a *direct sum* of charges
  (``charges`` attribute).  Charges act like a hidden trailing leg of
  multiplicity one; ``tensordot`` fuses the two hidden legs with a CG and
  emits all SU(2) outcomes, so intermediate mixed-charge tensors compose
  exactly like BlockTensorKit's charged MPO virtual legs.  Projection onto
  a target charge (e.g. an FSM channel) *selects the coupling* — it is
  exact, not lossy.
* ``tree`` — intermediate SU(2) labels of the left-to-right fusion of the
  (arrow-adjusted) legs into the charge (symmetry/trees.py).

Block data carry only multiplicity axes; all m-space structure lives in the
orthonormal numeric structure tensors, and every structural coefficient
(conj / transpose / contraction recoupling) is obtained by projecting a
numpy contraction of structure tensors onto the target tree basis, with a
completeness assertion.  Wrong-convention bugs therefore fail loudly
instead of producing silently wrong physics.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import AbelianGroup, Sector
from ..symmetry.spaces import Space
from ..symmetry.su2 import cg_array
from ..symmetry.trees import (Tree, enumerate_trees, project_onto_trees,
                              tree_tensor)

IN = False
OUT = True

LegKey = Tuple[Sector, ...]
BKey = Tuple[LegKey, Sector, Tree]

_COEFF_TOL = 1e-9


def _abelian_parts(group: AbelianGroup, q: Sector) -> Tuple[int, ...]:
    s = group.su2_slot
    return tuple(x for i, x in enumerate(q) if i != s)


def _su2_part(group: AbelianGroup, q: Sector) -> int:
    return q[group.su2_slot]


def _abelian_flux(group: AbelianGroup, arrows, key: LegKey) -> Tuple[int, ...]:
    """Abelian-slot flux (sum_out - sum_in), SU(2) slot excluded."""
    s = group.su2_slot
    acc = [0] * (len(group.factors) - 1)
    for arrow, q in zip(arrows, key):
        j = 0
        for i, f in enumerate(group.factors):
            if i == s:
                continue
            x = q[i] if arrow == OUT else f.dual(q[i])
            acc[j] = f.fuse(acc[j], x) if f.kind == "Z" else acc[j] + x
            j += 1
    return tuple(acc)


def _norm_charges(group, charge) -> Tuple[Sector, ...]:
    if charge is None:
        return (group.trivial,)
    if isinstance(charge, tuple) and charge and isinstance(charge[0], tuple):
        return tuple(sorted(set(tuple(c) for c in charge)))
    return (tuple(charge),)


class FusionTensor:
    __slots__ = ("group", "spaces", "arrows", "charges", "blocks", "dtype")

    def __init__(self, group, spaces, arrows, blocks, charge=None, dtype=None):
        self.group = group
        self.spaces = tuple(spaces)
        self.arrows = tuple(bool(a) for a in arrows)
        self.charges = _norm_charges(group, charge)
        self.blocks: Dict[BKey, jnp.ndarray] = blocks
        if dtype is None:
            dtype = next(iter(blocks.values())).dtype if blocks else jnp.float64
        # canonicalize against the x64 setting: without it a tensor
        # built with a float64 request on a non-x64 runtime would
        # DECLARE float64 while its blocks are truncated to float32,
        # and the declared dtype is pytree metadata - mixed declared
        # dtypes then break lax.cond/scan branch matching on TPU
        import jax as _jax
        self.dtype = jnp.dtype(_jax.dtypes.canonicalize_dtype(dtype))

    # ------------------------------------------------------------------
    @property
    def charge(self):
        """Single charge sector if pure, else the sorted tuple of sectors."""
        return self.charges[0] if len(self.charges) == 1 else self.charges

    @property
    def ndim(self) -> int:
        return len(self.spaces)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def zeros(cls, group, spaces, arrows, charge=None, dtype=jnp.float64,
              fill=True):
        t = cls(group, spaces, arrows, {}, charge, dtype)
        if fill:
            for bk in t.allowed_keys():
                t.blocks[bk] = jnp.zeros(t.key_shape(bk), dtype=dtype)
        return t

    @classmethod
    def random(cls, group, spaces, arrows, charge=None, dtype=jnp.float64,
               seed=0):
        t = cls(group, spaces, arrows, {}, charge, dtype)
        rng = np.random.default_rng(seed)
        for bk in t.allowed_keys():
            arr = rng.standard_normal(t.key_shape(bk))
            if jnp.dtype(dtype).kind == "c":
                arr = arr + 1j * rng.standard_normal(t.key_shape(bk))
            t.blocks[bk] = jnp.asarray(arr, dtype=dtype)
        return t

    # ------------------------------------------------------------------
    # static block-table queries
    # ------------------------------------------------------------------
    def key_shape(self, bk: BKey) -> Tuple[int, ...]:
        key = bk[0]
        return tuple(sp.dim_of(q) for sp, q in zip(self.spaces, key))

    def _tjs(self, key: LegKey) -> Tuple[int, ...]:
        s = self.group.su2_slot
        return tuple(q[s] for q in key)

    def key_allowed(self, bk: BKey) -> bool:
        key, c, tree = bk
        if c not in self.charges:
            return False
        for sp, q in zip(self.spaces, key):
            if sp.dim_of(q) == 0:
                return False
        if _abelian_flux(self.group, self.arrows, key) != \
                _abelian_parts(self.group, c):
            return False
        return tree in enumerate_trees(self._tjs(key), _su2_part(self.group, c))

    def allowed_keys(self) -> List[BKey]:
        g = self.group
        out: List[BKey] = []

        def rec(i: int, partial: LegKey):
            if i == self.ndim:
                flux = _abelian_flux(g, self.arrows, partial)
                tjs = self._tjs(partial)
                for c in self.charges:
                    if _abelian_parts(g, c) != flux:
                        continue
                    for tr in enumerate_trees(tjs, _su2_part(g, c)):
                        out.append((partial, c, tr))
                return
            for q, _ in self.spaces[i]:
                rec(i + 1, partial + (q,))

        rec(0, ())
        return out

    def structure(self):
        return (self.spaces, self.arrows, self.charges,
                tuple(sorted(self.blocks.keys())), str(self.dtype))

    # ------------------------------------------------------------------
    # elementwise / linear ops
    # ------------------------------------------------------------------
    def copy(self) -> "FusionTensor":
        return FusionTensor(self.group, self.spaces, self.arrows,
                            dict(self.blocks), self.charges, self.dtype)

    def _like(self, blocks, spaces=None, arrows=None, charge=None, dtype=None):
        return FusionTensor(
            self.group,
            spaces if spaces is not None else self.spaces,
            arrows if arrows is not None else self.arrows,
            blocks,
            charge if charge is not None else self.charges,
            dtype if dtype is not None else self.dtype,
        )

    def __add__(self, other: "FusionTensor") -> "FusionTensor":
        assert self.spaces == other.spaces and self.arrows == other.arrows
        charges = tuple(sorted(set(self.charges) | set(other.charges)))
        out = dict(self.blocks)
        for k, b in other.blocks.items():
            out[k] = out[k] + b if k in out else b
        return self._like(out, charge=charges,
                          dtype=jnp.result_type(self.dtype, other.dtype))

    def __sub__(self, other):
        return self + (other * (-1.0))

    def __mul__(self, scalar):
        return self._like({k: b * scalar for k, b in self.blocks.items()},
                          dtype=jnp.result_type(self.dtype,
                                                jnp.asarray(scalar).dtype))

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def astype(self, dtype):
        return self._like({k: b.astype(dtype) for k, b in self.blocks.items()},
                          dtype=dtype)

    def real_part(self):
        return self._like({k: jnp.real(b) for k, b in self.blocks.items()},
                          dtype=jnp.real(jnp.zeros((), self.dtype)).dtype)

    def norm_sq(self):
        if not self.blocks:
            return jnp.zeros((), dtype=jnp.float64)
        parts = [jnp.sum(jnp.abs(b) ** 2) for b in self.blocks.values()]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(sum(float(np.asarray(p)) for p in parts))
        return jnp.sum(jnp.stack(parts))

    def norm(self):
        return jnp.sqrt(self.norm_sq())

    def inner(self, other: "FusionTensor"):
        acc = None
        for k, b in self.blocks.items():
            o = other.blocks.get(k)
            if o is None:
                continue
            v = jnp.sum(jnp.conj(b) * o)
            acc = v if acc is None else acc + v
        if acc is None:
            return jnp.zeros((), dtype=jnp.result_type(self.dtype, other.dtype))
        return acc

    def scalar(self):
        """Value of a fully-contracted (0-leg, trivial-charge) tensor."""
        bk = ((), self.group.trivial, ())
        b = self.blocks.get(bk)
        return b if b is not None else jnp.zeros((), dtype=self.dtype)

    def drop_zero_blocks(self, tol: float = 0.0) -> "FusionTensor":
        out = {}
        for k, b in self.blocks.items():
            if float(jnp.max(jnp.abs(b))) > tol:
                out[k] = b
        return self._like(out)

    def project_charge(self, charge) -> "FusionTensor":
        """Restrict to the given charge sector(s); drops other components.
        For SU(2) this selects couplings exactly (orthogonal sectors)."""
        keep = _norm_charges(self.group, charge)
        out = {k: b for k, b in self.blocks.items() if k[1] in keep}
        return self._like(out, charge=keep)

    def project_like(self, template: "FusionTensor") -> "FusionTensor":
        return self.project_charge(template.charges)

    # ------------------------------------------------------------------
    # structural ops (numeric recoupling)
    # ------------------------------------------------------------------
    def conj(self) -> "FusionTensor":
        """Complex conjugate: flips all arrows, dualizes the charge, keeps
        sector labels (same bookkeeping as the abelian SymTensor.conj)."""
        g = self.group
        new_arrows = tuple(not a for a in self.arrows)
        out: Dict[BKey, jnp.ndarray] = {}
        for (key, c, tr), b in self.blocks.items():
            nc = g.dual(c)
            tjs = self._tjs(key)
            for ntr, coeff in _conj_coeffs(tjs, self.arrows,
                                           _su2_part(g, c), tr):
                if abs(coeff) < _COEFF_TOL:
                    continue
                bk = (key, nc, ntr)
                v = jnp.conj(b) * coeff
                out[bk] = out[bk] + v if bk in out else v
        return FusionTensor(g, self.spaces, new_arrows, out,
                            tuple(sorted(g.dual(c) for c in self.charges)),
                            self.dtype)

    def transpose(self, perm: Sequence[int]) -> "FusionTensor":
        perm = tuple(perm)
        g = self.group
        out: Dict[BKey, jnp.ndarray] = {}
        for (key, c, tr), b in self.blocks.items():
            nkey = tuple(key[i] for i in perm)
            tjs = self._tjs(key)
            for ntr, coeff in _transpose_coeffs(tjs, self.arrows,
                                                _su2_part(g, c), tr, perm):
                if abs(coeff) < _COEFF_TOL:
                    continue
                bk = (nkey, c, ntr)
                v = jnp.transpose(b, perm) * coeff
                out[bk] = out[bk] + v if bk in out else v
        return FusionTensor(g,
                            tuple(self.spaces[i] for i in perm),
                            tuple(self.arrows[i] for i in perm),
                            out, self.charges, self.dtype)

    def flip_arrow(self, leg: int) -> "FusionTensor":
        g = self.group
        spaces = list(self.spaces)
        spaces[leg] = spaces[leg].dual()
        arrows = list(self.arrows)
        arrows[leg] = not arrows[leg]
        out: Dict[BKey, jnp.ndarray] = {}
        for (key, c, tr), b in self.blocks.items():
            nkey = list(key)
            nkey[leg] = g.dual(nkey[leg])
            tjs = self._tjs(key)
            for ntr, coeff in _flip_coeffs(tjs, self.arrows,
                                           _su2_part(g, c), tr, leg):
                if abs(coeff) < _COEFF_TOL:
                    continue
                bk = (tuple(nkey), c, ntr)
                v = b * coeff
                out[bk] = out[bk] + v if bk in out else v
        return FusionTensor(g, spaces, arrows, out, self.charges, self.dtype)

    # ------------------------------------------------------------------
    # dense conversion (tests / operator construction)
    # ------------------------------------------------------------------
    def to_dense(self) -> np.ndarray:
        """Dense array with qdim-weighted leg axes plus a trailing charge
        M-axis (dropped when every charge is SU(2)-trivial).  Within a
        sector slice the layout is (multiplicity, m), m fastest.  The
        trailing axis spans the *largest* charge qdim; smaller-charge
        components are zero-padded (single-charge tensors in practice)."""
        g = self.group
        Mdim = max(g.factors[g.su2_slot].qdim(_su2_part(g, c))
                   for c in self.charges)
        shape = tuple(sp.dense_dim for sp in self.spaces) + (Mdim,)
        out = np.zeros(shape, dtype=np.complex128 if self.dtype.kind == "c"
                       else np.float64)
        offs = [sp.dense_offsets() for sp in self.spaces]
        for (key, c, tr), b in self.blocks.items():
            tjs = self._tjs(key)
            tjc = _su2_part(g, c)
            S = tree_tensor(tjs, self.arrows, tjc, tr)  # (m..., M)
            dense = np.multiply.outer(np.asarray(b), S)
            # axes now (d1..dn, m1..mn, M) -> interleave to (d1,m1,...,M)
            n = len(key)
            order = []
            for i in range(n):
                order.extend([i, n + i])
            order.append(2 * n)
            dense = np.transpose(dense, order)
            newshape = tuple(b.shape[i] * (tjs[i] + 1) for i in range(n)) \
                + (tjc + 1,)
            dense = dense.reshape(newshape)
            slc = tuple(
                slice(offs[i][q], offs[i][q] + newshape[i])
                for i, q in enumerate(key)) + (slice(0, tjc + 1),)
            out[slc] += dense
        if Mdim == 1:
            out = out[..., 0]
        return out

    @classmethod
    def from_dense(cls, group, spaces, arrows, dense, charge=None, dtype=None,
                   tol=1e-12):
        """Inverse of :meth:`to_dense` (single charge only)."""
        charges = _norm_charges(group, charge)
        assert len(charges) == 1, "from_dense requires a single charge"
        c = charges[0]
        tjc = _su2_part(group, c)
        dense = np.asarray(dense)
        if dense.ndim == len(spaces):
            assert tjc == 0
            dense = dense[..., None]
        dtype = dtype or dense.dtype
        t = cls(group, spaces, arrows, {}, charge, dtype)
        offs = [sp.dense_offsets() for sp in t.spaces]
        recon = np.zeros_like(dense, dtype=np.complex128)
        for bk in t.allowed_keys():
            key, _, tr = bk
            tjs = t._tjs(key)
            mult = t.key_shape(bk)
            slc = tuple(slice(offs[i][q],
                              offs[i][q] + mult[i] * (tjs[i] + 1))
                        for i, q in enumerate(key)) + (slice(0, tjc + 1),)
            blk = dense[slc]
            n = len(key)
            split = []
            for i in range(n):
                split.extend([mult[i], tjs[i] + 1])
            split.append(tjc + 1)
            blk = blk.reshape(split)
            # de-interleave to (d..., m..., M)
            order = [2 * i for i in range(n)] + [2 * i + 1 for i in range(n)] \
                + [2 * n]
            blk = np.transpose(blk, order)
            S = tree_tensor(tjs, t.arrows, tjc, tr)
            m_axes = tuple(range(n, 2 * n + 1))
            data = np.tensordot(blk, S, axes=(m_axes, tuple(range(n + 1))))
            if np.max(np.abs(data)) > tol:
                t.blocks[bk] = jnp.asarray(data, dtype=dtype)
            # structure tensors are orthonormal but NOT complete in the dense
            # slice (the rest belongs to other charges); track reconstruction
            dense_part = np.multiply.outer(data, np.asarray(S))
            order2 = []
            for i in range(n):
                order2.extend([i, n + i])
            order2.append(2 * n)
            dense_part = np.transpose(dense_part, order2).reshape(
                tuple(mult[i] * (tjs[i] + 1) for i in range(n)) + (tjc + 1,))
            recon[slc] += dense_part
        if not np.allclose(recon, dense,
                           atol=max(tol, 1e-10 * max(1.0, float(np.max(np.abs(dense)))))):
            raise ValueError(
                "dense tensor has weight outside the requested charge sector")
        return t

    def __repr__(self):  # pragma: no cover
        return (f"FusionTensor(ndim={self.ndim}, charges={self.charges}, "
                f"nblocks={len(self.blocks)}, dtype={self.dtype})")


# ----------------------------------------------------------------------
# numeric recoupling coefficients (cached on SU(2) structure only)
# ----------------------------------------------------------------------

@lru_cache(maxsize=None)
def _conj_coeffs(tjs: Tuple[int, ...], arrows: Tuple[bool, ...], tjc: int,
                 tree: Tree) -> Tuple[Tuple[Tree, float], ...]:
    """Expansion of conj(S[tree]) in the flipped-arrow tree basis.

    conj is defined with the charge conjugator folded in:
    S'[m..., M'] = sum_M C_c[M', M] S[m..., M]  (S real, so no numeric conj).
    """
    from ..symmetry.su2 import conj_mat
    S = tree_tensor(tjs, arrows, tjc, tree)
    Cc = conj_mat(tjc)
    expr = np.tensordot(S, Cc.T, axes=([S.ndim - 1], [0]))
    new_arrows = tuple(not a for a in arrows)
    trees, coeffs, resid = project_onto_trees(tjs, new_arrows, tjc, expr)
    assert resid < _COEFF_TOL, f"conj projection incomplete: {resid}"
    return tuple((t, float(c)) for t, c in zip(trees, coeffs))


@lru_cache(maxsize=None)
def _transpose_coeffs(tjs, arrows, tjc, tree, perm
                      ) -> Tuple[Tuple[Tree, float], ...]:
    S = tree_tensor(tjs, arrows, tjc, tree)
    expr = np.transpose(S, tuple(perm) + (len(tjs),))
    ntjs = tuple(tjs[i] for i in perm)
    narrows = tuple(arrows[i] for i in perm)
    trees, coeffs, resid = project_onto_trees(ntjs, narrows, tjc, expr)
    assert resid < _COEFF_TOL, f"transpose projection incomplete: {resid}"
    return tuple((t, float(c)) for t, c in zip(trees, coeffs))


@lru_cache(maxsize=None)
def _flip_coeffs(tjs, arrows, tjc, tree, leg
                 ) -> Tuple[Tuple[Tree, float], ...]:
    """Arrow flip on one leg: apply the duality conjugator on that axis and
    re-expand in the flipped basis (pure recoupling, data reused)."""
    from ..symmetry.su2 import conj_mat
    S = tree_tensor(tjs, arrows, tjc, tree)
    C = conj_mat(tjs[leg])
    expr = np.moveaxis(np.tensordot(C, S, axes=([1], [leg])), 0, leg)
    narrows = tuple((not a) if i == leg else a for i, a in enumerate(arrows))
    trees, coeffs, resid = project_onto_trees(tjs, narrows, tjc, expr)
    assert resid < _COEFF_TOL, f"flip projection incomplete: {resid}"
    return tuple((t, float(c)) for t, c in zip(trees, coeffs))


@lru_cache(maxsize=None)
def _tdot_coeffs(tjsA, arrowsA, tjcA, treeA, axA,
                 tjsB, arrowsB, tjcB, treeB, axB
                 ) -> Tuple[Tuple[int, Tree, float], ...]:
    """Recoupling for tensordot: expansion of the contracted pair of
    structure tensors (charge legs combined with a CG) in the out tree
    basis.  Returns ((tjc_out, tree_out, coeff), ...)."""
    SA = tree_tensor(tjsA, arrowsA, tjcA, treeA)
    SB = tree_tensor(tjsB, arrowsB, tjcB, treeB)
    K = np.tensordot(SA, SB, axes=(axA, axB))
    # K axes: (freeA m..., M_A, freeB m..., M_B)
    nfa = len(tjsA) - len(axA)
    # move M_A next to M_B at the end
    K = np.moveaxis(K, nfa, -2)
    # out structure
    freeA = [i for i in range(len(tjsA)) if i not in axA]
    freeB = [i for i in range(len(tjsB)) if i not in axB]
    ntjs = tuple(tjsA[i] for i in freeA) + tuple(tjsB[i] for i in freeB)
    narrows = tuple(arrowsA[i] for i in freeA) + \
        tuple(arrowsB[i] for i in freeB)
    out: List[Tuple[int, Tree, float]] = []
    total_nrm2 = float(np.sum(K * K))
    captured = 0.0
    for tjc_out in range(abs(tjcA - tjcB), tjcA + tjcB + 1, 2):
        CG = cg_array(tjcA, tjcB, tjc_out)
        comb = np.tensordot(K, CG, axes=([K.ndim - 2, K.ndim - 1], [0, 1]))
        trees, coeffs, _ = project_onto_trees(ntjs, narrows, tjc_out, comb)
        for t, c in zip(trees, coeffs):
            if abs(c) >= _COEFF_TOL:
                out.append((tjc_out, t, float(c)))
            captured += float(c) ** 2
    if total_nrm2 > 1e-20:
        assert abs(captured - total_nrm2) < _COEFF_TOL * max(1.0, total_nrm2), (
            f"tensordot projection incomplete: {captured} vs {total_nrm2}")
    return tuple(out)


# ----------------------------------------------------------------------
# contraction
# ----------------------------------------------------------------------

def fusion_tensordot(A: FusionTensor, B: FusionTensor, axes) -> FusionTensor:
    """Charge-conserving tensordot with SU(2) recoupling.  Contracted legs
    must carry equal sector labels and opposite arrows; hidden charge legs
    fuse (A's charge first)."""
    if isinstance(axes, int):
        axA = tuple(range(A.ndim - axes, A.ndim))
        axB = tuple(range(axes))
    else:
        axA, axB = tuple(axes[0]), tuple(axes[1])
    assert len(axA) == len(axB)
    for i, j in zip(axA, axB):
        if A.spaces[i] != B.spaces[j]:
            raise ValueError(
                f"contracted legs {i},{j} have different spaces:\n"
                f" {A.spaces[i]}\n {B.spaces[j]}")
        if A.arrows[i] == B.arrows[j]:
            raise ValueError(
                f"contracted legs {i},{j} have same arrow; flip_arrow first")

    freeA = [i for i in range(A.ndim) if i not in axA]
    freeB = [j for j in range(B.ndim) if j not in axB]
    g = A.group
    slot = g.su2_slot

    bmap: Dict[Tuple[Sector, ...], List] = {}
    for (kB, cB, tB), b in B.blocks.items():
        sig = tuple(kB[j] for j in axB)
        bmap.setdefault(sig, []).append(
            (tuple(kB[j] for j in freeB), cB, tB, b))

    out_blocks: Dict[BKey, jnp.ndarray] = {}
    out_charges = set()
    for cA in A.charges:
        for cB in B.charges:
            out_charges.update(g.fuse_outcomes(cA, cB))
    out_charges = tuple(sorted(out_charges))

    for (kA, cA, tA), a in A.blocks.items():
        sig = tuple(kA[i] for i in axA)
        kA_free = tuple(kA[i] for i in freeA)
        tjsA = tuple(q[slot] for q in kA)
        for kB_free, cB, tB, b in bmap.get(sig, ()):
            kO = kA_free + kB_free
            # reconstruct B's full leg sector list for tjs
            kB_list = [None] * B.ndim
            for idx, j in enumerate(axB):
                kB_list[j] = sig[idx]
            for idx, j in enumerate(freeB):
                kB_list[j] = kB_free[idx]
            tjsB = tuple(q[slot] for q in kB_list)
            coeffs = _tdot_coeffs(tjsA, A.arrows, cA[slot], tA, axA,
                                  tjsB, B.arrows, cB[slot], tB, axB)
            if not coeffs:
                continue
            m = jnp.tensordot(a, b, (list(axA), list(axB)))
            flux_abelian = tuple(
                fa.fuse(x, y) if fa.kind == "Z" else x + y
                for fa, x, y in zip(
                    (f for i, f in enumerate(g.factors) if i != slot),
                    _abelian_parts(g, cA), _abelian_parts(g, cB)))
            for tjc_out, t_out, coeff in coeffs:
                # rebuild the full out charge sector
                c_out = []
                it = iter(flux_abelian)
                for i in range(len(g.factors)):
                    c_out.append(tjc_out if i == slot else next(it))
                c_out = tuple(c_out)
                bk = (kO, c_out, t_out)
                v = m * coeff
                out_blocks[bk] = out_blocks[bk] + v if bk in out_blocks else v

    return FusionTensor(
        g,
        tuple(A.spaces[i] for i in freeA) + tuple(B.spaces[j] for j in freeB),
        tuple(A.arrows[i] for i in freeA) + tuple(B.arrows[j] for j in freeB),
        out_blocks,
        out_charges,
        jnp.result_type(A.dtype, B.dtype),
    )


def append_trivial_leg(t: FusionTensor, arrow: bool) -> FusionTensor:
    """Append a trivial-sector multiplicity-1 leg (e.g. the INIT/FINAL MPO
    channel).  Fusing with the trivial rep leaves tree data unchanged; the
    new tree label gains the total-spin entry and blocks a size-1 axis."""
    g = t.group
    slot = g.su2_slot
    sp = Space(g, {g.trivial: 1})
    blocks = {}
    for (key, c, tr), b in t.blocks.items():
        n = len(key)
        ntr = tr + ((c[slot],) if n >= 2 else ())
        blocks[(key + (g.trivial,), c, ntr)] = b[..., None]
    return FusionTensor(g, t.spaces + (sp,), t.arrows + (bool(arrow),),
                        blocks, t.charges, t.dtype)


# ----------------------------------------------------------------------
# pytree registration
# ----------------------------------------------------------------------

def _flatten(t: FusionTensor):
    keys = tuple(sorted(t.blocks.keys()))
    children = tuple(t.blocks[k] for k in keys)
    aux = (t.group, t.spaces, t.arrows, t.charges, keys, str(t.dtype))
    return children, aux


def _unflatten(aux, children):
    group, spaces, arrows, charges, keys, dtype = aux
    return FusionTensor(group, spaces, arrows, dict(zip(keys, children)),
                        charges, dtype)


jax.tree_util.register_pytree_node(FusionTensor, _flatten, _unflatten)
