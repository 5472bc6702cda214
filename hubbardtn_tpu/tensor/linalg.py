"""Block linear algebra: matricization, SVD/QR/LQ/polar, truncation.

TPU-native equivalent of TensorKit's per-block factorizations (used by MPSKit
for gauging and by the reference's truncation drivers, e.g. ``SvdCut`` /
``truncbelow`` at /root/reference/src/HubbardFunctions.jl:1010-1023,1363-1365).

A tensor is matricized at a leg bipartition.  The matrix block charge is the
charge *flowing left-to-right through the cut*::

    r(row combo) = sum_{row legs} (q if arrow IN else dual(q))

so MPS bond sectors read naturally as accumulated physical charge.  The new
bond legs created by factorizations carry ``OUT`` arrow on the left factor and
``IN`` arrow on the right factor, both labeled by ``r``.

Everything except truncation decisions is jittable (static block tables);
truncation inspects singular values on the host, as in SURVEY.md's
"driver layer" plan.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import AbelianGroup, Sector
from ..symmetry.spaces import Space
from .symtensor import IN, OUT, Key, SymTensor


@dataclass
class LegFusion:
    """Layout of a fused group of legs, per fused charge."""

    # charge -> list of (combo key, offset, shape)
    entries: Dict[Sector, List[Tuple[Key, int, Tuple[int, ...]]]]
    # charge -> total fused dimension
    dims: Dict[Sector, int]
    # combo key -> (charge, offset, size)
    lookup: Dict[Key, Tuple[Sector, int, int]]


def fuse_legs(group: AbelianGroup, spaces: Sequence[Space], arrows: Sequence[bool],
              use_in: bool, shift: Optional[Sector] = None) -> LegFusion:
    combos: List[Tuple[Key, Sector, Tuple[int, ...]]] = [((), group.trivial, ())]
    for sp, ar in zip(spaces, arrows):
        new = []
        for key, ch, shape in combos:
            for q, d in sp:
                eff = q if (ar == IN) == use_in else group.dual(q)
                new.append((key + (q,), group.fuse(ch, eff), shape + (d,)))
        combos = new
    entries: Dict[Sector, List[Tuple[Key, int, Tuple[int, ...]]]] = defaultdict(list)
    dims: Dict[Sector, int] = defaultdict(int)
    lookup: Dict[Key, Tuple[Sector, int, int]] = {}
    for key, ch, shape in combos:
        if shift is not None:
            ch = group.fuse(ch, shift)
        size = int(np.prod(shape)) if shape else 1
        off = dims[ch]
        entries[ch].append((key, off, shape))
        dims[ch] = off + size
        lookup[key] = (ch, off, size)
    return LegFusion(dict(entries), dict(dims), lookup)


def matricize(T: SymTensor, nrows: int):
    """Return (mats, rowinfo, colinfo): mats[r] is a 2D array per bond charge."""
    g = T.group
    rowinfo = fuse_legs(g, T.spaces[:nrows], T.arrows[:nrows], use_in=True)
    # cols: effective out-flow minus tensor charge equals the row charge r
    colinfo = fuse_legs(g, T.spaces[nrows:], T.arrows[nrows:], use_in=False,
                        shift=g.dual(T.charge))
    mats: Dict[Sector, jnp.ndarray] = {}
    for key, b in T.blocks.items():
        rkey, ckey = key[:nrows], key[nrows:]
        r, roff, rsize = rowinfo.lookup[rkey]
        c, coff, csize = colinfo.lookup[ckey]
        assert c == r, "charge bookkeeping error in matricize"
        if r not in mats:
            mats[r] = jnp.zeros((rowinfo.dims[r], colinfo.dims[r]), dtype=T.dtype)
        mats[r] = mats[r].at[roff:roff + rsize, coff:coff + csize].set(b.reshape(rsize, csize))
    return mats, rowinfo, colinfo


def dematricize(mats: Dict[Sector, jnp.ndarray], rowinfo: LegFusion, colinfo: LegFusion,
                T_template: SymTensor, nrows: int) -> SymTensor:
    """Inverse of matricize (block tables from the template tensor)."""
    blocks: Dict[Key, jnp.ndarray] = {}
    for r, m in mats.items():
        for rkey, roff, rshape in rowinfo.entries.get(r, ()):
            rsize = int(np.prod(rshape)) if rshape else 1
            for ckey, coff, cshape in colinfo.entries.get(r, ()):
                csize = int(np.prod(cshape)) if cshape else 1
                blk = m[roff:roff + rsize, coff:coff + csize].reshape(rshape + cshape)
                blocks[rkey + ckey] = blk
    return SymTensor(T_template.group, T_template.spaces, T_template.arrows, blocks,
                     T_template.charge, T_template.dtype)


def _left_factor(T: SymTensor, nrows: int, rowinfo: LegFusion,
                 blocks_2d: Dict[Sector, jnp.ndarray], bond_space: Space) -> SymTensor:
    """Assemble the left factor (rows..., bond OUT) from per-charge matrices."""
    out_blocks: Dict[Key, jnp.ndarray] = {}
    for r, m in blocks_2d.items():
        if bond_space.dim_of(r) == 0:
            continue
        for rkey, roff, rshape in rowinfo.entries.get(r, ()):
            rsize = int(np.prod(rshape)) if rshape else 1
            out_blocks[rkey + (r,)] = m[roff:roff + rsize, :].reshape(rshape + (m.shape[1],))
    return SymTensor(T.group, T.spaces[:nrows] + (bond_space,), T.arrows[:nrows] + (OUT,),
                     out_blocks, T.group.trivial, T.dtype)


def _right_factor(T: SymTensor, nrows: int, colinfo: LegFusion,
                  blocks_2d: Dict[Sector, jnp.ndarray], bond_space: Space) -> SymTensor:
    """Assemble the right factor (bond IN, cols...) from per-charge matrices."""
    out_blocks: Dict[Key, jnp.ndarray] = {}
    for r, m in blocks_2d.items():
        if bond_space.dim_of(r) == 0:
            continue
        for ckey, coff, cshape in colinfo.entries.get(r, ()):
            csize = int(np.prod(cshape)) if cshape else 1
            out_blocks[(r,) + ckey] = m[:, coff:coff + csize].reshape((m.shape[0],) + cshape)
    return SymTensor(T.group, (bond_space,) + T.spaces[nrows:], (IN,) + T.arrows[nrows:],
                     out_blocks, T.charge, T.dtype)


# ----------------------------------------------------------------------
# factorizations
# ----------------------------------------------------------------------

def _traced(m) -> bool:
    import jax
    return isinstance(m, jax.core.Tracer)


def _qr_reduced(m):
    """Reduced QR: jnp under tracing, numpy LAPACK eagerly (XLA CPU's eager
    LAPACK custom calls were observed to corrupt the heap sporadically)."""
    if _traced(m):
        return jnp.linalg.qr(m, mode="reduced")
    q, r = np.linalg.qr(np.asarray(m), mode="reduced")
    return jnp.asarray(q, dtype=m.dtype), jnp.asarray(r, dtype=m.dtype)


def _svd_thin(m):
    if _traced(m):
        return jnp.linalg.svd(m, full_matrices=False)
    u, s, vh = np.linalg.svd(np.asarray(m), full_matrices=False)
    return (jnp.asarray(u, dtype=m.dtype), jnp.asarray(s),
            jnp.asarray(vh, dtype=m.dtype))


def _eigh_host(m):
    if _traced(m):
        return jnp.linalg.eigh(m)
    w, v = np.linalg.eigh(np.asarray(m))
    return jnp.asarray(w), jnp.asarray(v, dtype=m.dtype)


def _pos_diag(q, r):
    """Gauge-fix a reduced QR so diag(R) >= 0 (unique, phase-stable)."""
    d = jnp.diagonal(r)
    mag = jnp.abs(d)
    ph = jnp.where(mag > 1e-300, d / jnp.where(mag > 1e-300, mag, 1.0), 1.0)
    return q * ph[None, :], r * jnp.conj(ph)[:, None]


def qr(T: SymTensor, nrows: int) -> Tuple[SymTensor, SymTensor]:
    """T = Q R with Q an isometry (Q^dag Q = I on the bond)."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.qr(T, nrows)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Qs, Rs, bond = {}, {}, {}
    for r, m in mats.items():
        q, rr = _qr_reduced(m)
        q, rr = _pos_diag(q, rr)
        Qs[r], Rs[r] = q, rr
        bond[r] = q.shape[1]
    bond_space = Space(T.group, bond)
    Q = _left_factor(T, nrows, rowinfo, Qs, bond_space)
    R = _right_factor(T, nrows, colinfo, Rs, bond_space)
    return Q, R


def lq(T: SymTensor, nrows: int) -> Tuple[SymTensor, SymTensor]:
    """T = L Q with Q having orthonormal rows (Q Q^dag = I on the bond)."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.lq(T, nrows)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Ls, Qs, bond = {}, {}, {}
    for r, m in mats.items():
        qt, rt = _qr_reduced(jnp.conj(m.T))
        qt, rt = _pos_diag(qt, rt)
        Ls[r] = jnp.conj(rt.T)
        Qs[r] = jnp.conj(qt.T)
        bond[r] = qt.shape[1]
    bond_space = Space(T.group, bond)
    L = _left_factor(T, nrows, rowinfo, Ls, bond_space)
    Q = _right_factor(T, nrows, colinfo, Qs, bond_space)
    return L, Q


def svd(T: SymTensor, nrows: int):
    """Full (untruncated) SVD: returns (U, s_dict, Vh, bond_space)."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.svd(T, nrows)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Us, ss, Vhs, bond = {}, {}, {}, {}
    for r, m in mats.items():
        u, s, vh = _svd_thin(m)
        Us[r], ss[r], Vhs[r] = u, s, vh
        bond[r] = u.shape[1]
    bond_space = Space(T.group, bond)
    U = _left_factor(T, nrows, rowinfo, Us, bond_space)
    Vh = _right_factor(T, nrows, colinfo, Vhs, bond_space)
    return U, ss, Vh, bond_space


def polar(T: SymTensor, nrows: int) -> SymTensor:
    """Unitary polar factor of the matricization (isometry W = U V^dag)."""
    mats, rowinfo, colinfo = matricize(T, nrows)
    Ws = {}
    bond = {}
    for r, m in mats.items():
        u, _, vh = _svd_thin(m)
        Ws[r] = u @ vh
        bond[r] = m.shape[1]
    # polar factor has the same shape as T itself
    out = dematricize(Ws, rowinfo, colinfo, T, nrows)
    return out


def eigh(T: SymTensor) -> Tuple[Dict[Sector, jnp.ndarray], SymTensor]:
    """Hermitian eigendecomposition of a square 2-leg tensor.

    Returns (eigenvalues per sector, eigenvector tensor V with legs
    (row, bond OUT)) such that T = V diag(w) V^dag."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.eigh(T)
    assert T.ndim == 2
    ws, Vs, bond = {}, {}, {}
    for (q0, q1), b in T.blocks.items():
        assert q0 == q1, "eigh requires block-diagonal tensor"
        w, v = _eigh_host(b)
        ws[q0], Vs[q0] = w, v
        bond[q0] = b.shape[0]
    bond_space = Space(T.group, bond)
    blocks = {(q, q): v for q, v in Vs.items()}
    V = SymTensor(T.group, (T.spaces[0], bond_space), (T.arrows[0], OUT), blocks,
                  T.group.trivial, T.dtype)
    return ws, V


# ----------------------------------------------------------------------
# truncation (host-side decisions, reference truncbelow/truncdim analogs)
# ----------------------------------------------------------------------

@dataclass(frozen=True)
class Truncation:
    """Combined truncation scheme.

    cutoff: discard singular values < cutoff (reference ``truncbelow``,
        src/HubbardFunctions.jl:1010).
    max_dim: keep at most this many states in total, largest first
        (reference ``truncdim``, :1363-1365).
    rel_cutoff: discard singular values < rel_cutoff * s_max.
    """

    cutoff: float = 0.0
    max_dim: Optional[int] = None
    rel_cutoff: float = 0.0

    def keep_counts(self, ss: Dict[Sector, np.ndarray]) -> Dict[Sector, int]:
        entries = []  # (value, sector, index)
        for q, s in ss.items():
            s = np.asarray(s)
            for i, v in enumerate(s):
                entries.append((float(v), q, i))
        entries.sort(key=lambda e: -e[0])
        if self.max_dim is not None:
            entries = entries[: self.max_dim]
        cut = self.cutoff
        if entries and self.rel_cutoff > 0.0:
            cut = max(cut, self.rel_cutoff * entries[0][0])
        kept = [e for e in entries if e[0] >= cut]
        if not kept and entries:
            kept = entries[:1]  # never return an empty bond
        counts: Dict[Sector, int] = defaultdict(int)
        for _, q, i in kept:
            counts[q] = max(counts[q], i + 1)
        return dict(counts)


def svd_truncate(T: SymTensor, nrows: int, trunc: Truncation):
    """Truncated SVD.  Returns (U, s_dict, Vh, bond_space, err) where err is
    the Frobenius norm of the discarded singular values."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.svd_truncate(T, nrows, trunc)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Us, ss, Vhs = {}, {}, {}
    for r, m in mats.items():
        u, s, vh = _svd_thin(m)
        Us[r], ss[r], Vhs[r] = u, s, vh
    ss_host = {q: np.asarray(s) for q, s in ss.items()}
    counts = trunc.keep_counts(ss_host)
    err_sq = 0.0
    for q, s in ss_host.items():
        k = counts.get(q, 0)
        err_sq += float(np.sum(s[k:] ** 2))
    Us_t, ss_t, Vhs_t, bond = {}, {}, {}, {}
    for q, k in counts.items():
        if k == 0:
            continue
        Us_t[q] = Us[q][:, :k]
        ss_t[q] = ss[q][:k]
        Vhs_t[q] = Vhs[q][:k, :]
        bond[q] = k
    bond_space = Space(T.group, bond)
    U = _left_factor(T, nrows, rowinfo, Us_t, bond_space)
    Vh = _right_factor(T, nrows, colinfo, Vhs_t, bond_space)
    return U, ss_t, Vh, bond_space, float(np.sqrt(err_sq))


def left_null(T: SymTensor, nrows: int) -> SymTensor:
    """Orthonormal complement of the column space of the matricization:
    returns N with legs (rows..., null_bond OUT), N^dag T = 0, N^dag N = I.
    Sectors absent from T's blocks contribute their full row space.

    Runs on the host through numpy's LAPACK: XLA CPU's complete-mode QR was
    observed to corrupt the heap for some block shapes (glibc malloc aborts
    several calls later), and null spaces are host-driven anyway."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.left_null(T, nrows)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Ns, bond = {}, {}
    for r, m_dim in rowinfo.dims.items():
        A = mats.get(r)
        if A is None:
            N = jnp.eye(m_dim, dtype=T.dtype)
        else:
            An = np.asarray(A)
            q = np.linalg.qr(An, mode="complete")[0]
            N = jnp.asarray(q[:, An.shape[1]:], dtype=T.dtype)
        if N.shape[1] == 0:
            continue
        Ns[r] = N
        bond[r] = N.shape[1]
    bond_space = Space(T.group, bond)
    return _left_factor(T, nrows, rowinfo, Ns, bond_space)


def right_null(T: SymTensor, nrows: int) -> SymTensor:
    """Orthonormal complement of the row space of the matricization:
    returns N with legs (null_bond IN, cols...), T N^dag = 0, N N^dag = I.
    Host-side numpy QR (see left_null)."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.right_null(T, nrows)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Ns, bond = {}, {}
    for r, n_dim in colinfo.dims.items():
        A = mats.get(r)
        if A is None:
            N = jnp.eye(n_dim, dtype=T.dtype)
        else:
            An = np.asarray(A)
            q = np.linalg.qr(np.conj(An.T), mode="complete")[0]
            N = jnp.asarray(np.conj(q[:, An.shape[0]:].T), dtype=T.dtype)
        if N.shape[0] == 0:
            continue
        Ns[r] = N
        bond[r] = N.shape[0]
    bond_space = Space(T.group, bond)
    return _right_factor(T, nrows, colinfo, Ns, bond_space)


def pad_leg(T: SymTensor, leg: int, new_space: Space,
            offsets: Optional[Dict[Sector, int]] = None) -> SymTensor:
    """Zero-pad one leg into a larger space; old data sits at the per-sector
    ``offsets`` (default 0).  Sectors of T absent from new_space must not
    occur."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.pad_leg(T, leg, new_space, offsets)
    offsets = offsets or {}
    blocks = {}
    for key, b in T.blocks.items():
        q = key[leg]
        d_new = new_space.dim_of(q)
        d_old = b.shape[leg]
        off = offsets.get(q, 0)
        if d_new < d_old + off:
            raise ValueError(
                f"pad_leg: sector {q} shrinks ({d_old}+{off} -> {d_new})")
        pad = [(0, 0)] * b.ndim
        pad[leg] = (off, d_new - d_old - off)
        if _traced(b):
            blocks[key] = jnp.pad(b, pad)
        else:
            blocks[key] = jnp.asarray(np.pad(np.asarray(b), pad))
    spaces = list(T.spaces)
    spaces[leg] = new_space
    return SymTensor(T.group, spaces, T.arrows, blocks, T.charge, T.dtype)


def concat_leg(A: SymTensor, B: SymTensor, leg: int) -> SymTensor:
    """Direct sum along one leg (A's states first, then B's); all other legs
    must carry identical spaces."""
    new_space = A.spaces[leg].oplus(B.spaces[leg])
    offB = {q: A.spaces[leg].dim_of(q) for q, _ in B.spaces[leg]}
    Ap = pad_leg(A, leg, new_space)
    Bp = pad_leg(B, leg, new_space, offB)
    return Ap + Bp


def svd_project(T: SymTensor, nrows: int, bond_space: Space):
    """SVD truncated to a *given* bond space (leading Schmidt vectors per
    sector, exactly min(requested, available) states).  Keeps block tables
    fixed — the jit-friendly truncation used inside IDMRG2 sweeps."""
    if not isinstance(T, SymTensor):
        from . import fusion_linalg as _fla
        return _fla.svd_project(T, nrows, bond_space)
    mats, rowinfo, colinfo = matricize(T, nrows)
    Us, ss, Vhs, bond = {}, {}, {}, {}
    for r, m in mats.items():
        k = bond_space.dim_of(r)
        if k == 0:
            continue
        u, s, vh = _svd_thin(m)
        k = min(k, u.shape[1])
        Us[r], ss[r], Vhs[r] = u[:, :k], s[:k], vh[:k, :]
        bond[r] = k
    bspace = Space(T.group, bond)
    U = _left_factor(T, nrows, rowinfo, Us, bspace)
    Vh = _right_factor(T, nrows, colinfo, Vhs, bspace)
    return U, ss, Vh, bspace


def diag_tensor(group, bond_space: Space, values: Dict[Sector, jnp.ndarray], dtype=None) -> SymTensor:
    """Diagonal 2-leg tensor (bond IN, bond OUT) from per-sector vectors."""
    if getattr(group, "has_su2", False):
        from . import fusion_linalg as _fla
        return _fla.diag_tensor(group, bond_space, values, dtype)
    blocks = {}
    for q, v in values.items():
        blocks[(q, q)] = jnp.diag(jnp.asarray(v))
    t = SymTensor(group, (bond_space, bond_space), (IN, OUT), blocks, group.trivial,
                  dtype or next(iter(blocks.values())).dtype if blocks else jnp.float64)
    return t
