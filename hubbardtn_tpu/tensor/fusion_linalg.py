"""Factorizations for fusion-tree tensors (QR/LQ/SVD/null spaces).

SU(2)-aware counterpart of :mod:`tensor.linalg`.  Strategy: build an
explicit *fusing isometry* F — a FusionTensor mapping a group of legs onto a
single bond leg, orthonormalized numerically through the engine itself —
then every factorization is plain per-sector matrix LAPACK between
``F^dag . T`` and reconstruction via ``F``.  All recoupling rides the
validated ``fusion_tensordot``; nothing here touches CG conventions
directly.

Only SU(2)-charge-trivial tensors are matricized (every QR/SVD call site in
the algorithms operates on neutral tensors); charged tensors raise.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import AbelianGroup, Sector
from ..symmetry.spaces import Space
from ..symmetry.trees import enumerate_trees
from .fusion import (IN, OUT, FusionTensor, _abelian_flux, _abelian_parts,
                     fusion_tensordot)
from .linalg import Truncation, _pos_diag, _qr_reduced, _svd_thin

# cache: (group id is implied by spaces' group) spaces+arrows -> (F, bond)
_FUSE_CACHE: Dict = {}


@lru_cache(maxsize=None)
def _delta_coeff(tj: int, arrows: Tuple[bool, bool] = (IN, OUT)) -> float:
    """c1 such that the unique 2-leg neutral structure tensor for
    (arrow0 tj, arrow1 tj) equals c1 * delta (asserted).  Blocks of
    'matrix-like' 2-leg tensors relate to their dense matrices by this
    per-sector scalar: dense = block (x) c1*delta."""
    from ..symmetry.trees import tree_tensor
    S = np.asarray(tree_tensor((tj, tj), arrows, 0, ()))[:, :, 0]
    d = S[0, 0]
    assert abs(d) > 1e-14 and np.allclose(S, d * np.eye(tj + 1), atol=1e-12), \
        f"2-leg structure for arrows {arrows} is not delta-proportional"
    return float(d)


def mat_coeff(group: AbelianGroup, sector: Sector,
              arrows: Tuple[bool, bool] = (IN, OUT)) -> float:
    """Per-sector block<->matrix scalar for delta-layout 2-leg tensors."""
    return _delta_coeff(sector[group.su2_slot], arrows)


def fuse_isometry(group: AbelianGroup, spaces: Tuple[Space, ...],
                  arrows: Tuple[bool, ...]) -> Tuple[FusionTensor, Space]:
    """Isometry F with legs (spaces..., bond OUT), F^dag F = I on the bond.

    The bond sector of a leg-sector combo is (dual abelian flux, fused SU(2)
    spin); multiplicity stacks every (combo key, row tree) at a distinct
    offset."""
    ck = (id(group), tuple(spaces), tuple(arrows))
    hit = _FUSE_CACHE.get(ck)
    if hit is not None:
        return hit
    import jax
    with jax.ensure_compile_time_eval():
        # the isometry is static structure data; evaluate eagerly even when
        # first requested inside a jit trace (omnistaging would otherwise
        # turn its self-normalization gram into tracers)
        out = _build_fuse_isometry(group, spaces, arrows)
    _FUSE_CACHE[ck] = out
    return out


def _build_fuse_isometry(group: AbelianGroup, spaces: Tuple[Space, ...],
                         arrows: Tuple[bool, ...]) -> Tuple[FusionTensor, Space]:
    slot = group.su2_slot
    k = len(spaces)

    combos: List[Tuple[Tuple[Sector, ...], Tuple[int, ...]]] = [((), ())]
    entries: Dict[Sector, List[Tuple[Tuple[Sector, ...], Tuple, int, Tuple[int, ...]]]] = {}
    dims: Dict[Sector, int] = {}

    def key_combos(i, partial):
        if i == k:
            yield partial
            return
        for q, _ in spaces[i]:
            yield from key_combos(i + 1, partial + (q,))

    for key in key_combos(0, ()):
        flux = _abelian_flux(group, arrows, key)
        tjs = tuple(q[slot] for q in key)
        shape = tuple(sp.dim_of(q) for sp, q in zip(spaces, key))
        size = int(np.prod(shape)) if shape else 1
        # bond abelian parts: dual of the row flux (so Q = (rows, bond OUT)
        # is neutral); SU(2) spin = the fused spin s of the row tree
        dual_flux = []
        j = 0
        for i, f in enumerate(group.factors):
            if i == slot:
                continue
            dual_flux.append(f.dual(flux[j]))
            j += 1
        # enumerate full-row trees by final spin s
        smax = sum(tjs) if tjs else 0
        for s in range(0, smax + 1):
            trees = enumerate_trees(tjs, s)
            if not trees:
                continue
            sigma = []
            it = iter(dual_flux)
            for i in range(len(group.factors)):
                sigma.append(s if i == slot else next(it))
            sigma = tuple(sigma)
            for tr in trees:
                off = dims.get(sigma, 0)
                entries.setdefault(sigma, []).append((key, tr, off, shape))
                dims[sigma] = off + size

    bond = Space(group, {s: d for s, d in dims.items()})
    blocks: Dict = {}
    for sigma, ents in entries.items():
        s = sigma[slot]
        D = dims[sigma]
        for key, tr, off, shape in ents:
            size = int(np.prod(shape)) if shape else 1
            arr = np.zeros(shape + (D,))
            eye = np.eye(size).reshape(shape + (size,))
            arr[..., off:off + size] = eye
            # F tree over legs (rows..., bond): intermediates = row tree
            # intermediates + the fused spin s (bond leg couples s x s -> 0)
            ftree = tuple(tr) + ((s,) if k >= 1 else ())
            # for k+1 legs the tree label has length (k+1)-2 = k-1
            ftree = ftree[:max(k - 1, 0)]
            bk = (key + (sigma,), group.trivial, ftree)
            if bk in blocks:
                blocks[bk] = blocks[bk] + jnp.asarray(arr)
            else:
                blocks[bk] = jnp.asarray(arr)
    F = FusionTensor(group, tuple(spaces) + (bond,),
                     tuple(arrows) + (OUT,), blocks, None, jnp.float64)
    # numeric orthonormalization against the *dense* gram: G = F^dag F has
    # layout (bond IN, bond OUT), whose dense form is block (x) c1*delta, so
    # the dense diagonal is block[0,0]*c1 -- positive by construction.
    G = fusion_tensordot(F.conj(), F, axes=(tuple(range(k)), tuple(range(k))))
    scale: Dict[Sector, float] = {}
    for (bkey, c, tr), g in G.blocks.items():
        if c != group.trivial:
            assert float(np.max(np.abs(np.asarray(g)))) < 1e-10
            continue
        sig = bkey[0]
        gm = np.asarray(g) * mat_coeff(group, sig)
        d = np.diagonal(gm)
        assert np.allclose(gm, np.diag(d), atol=1e-10), "fuse gram not diagonal"
        assert np.allclose(d, d[0], atol=1e-10) and d[0] > 0, \
            "fuse dense gram not positive scalar"
        scale[sig] = float(np.real(d[0]))
    blocks2 = {}
    for bk, b in F.blocks.items():
        sigma = bk[0][-1]
        blocks2[bk] = b / np.sqrt(scale[sigma])
    F = FusionTensor(F.group, F.spaces, F.arrows, blocks2, None, F.dtype)
    return F, bond


def _check_neutral(T: FusionTensor):
    g = T.group
    slot = g.su2_slot
    for c in T.charges:
        if c[slot] != 0:
            raise NotImplementedError(
                "matricization of SU(2)-charged tensors is not supported")


def matricize(T: FusionTensor, nrows: int):
    """Per-bond-sector matrices of a neutral tensor plus the two fusing
    isometries needed to reassemble factors."""
    _check_neutral(T)
    g = T.group
    k, n = nrows, T.ndim
    Fr, bond_r = fuse_isometry(g, T.spaces[:k], T.arrows[:k])
    Fc, bond_c = fuse_isometry(g, T.spaces[k:], T.arrows[k:])
    M1 = fusion_tensordot(Fr.conj(), T,
                          axes=(tuple(range(k)), tuple(range(k))))
    # M1 legs: (bond_r IN, cols...)
    M2 = fusion_tensordot(M1, Fc.conj(),
                          axes=(tuple(range(1, n - k + 1)),
                                tuple(range(n - k))))
    # M2 legs: (bond_r IN, bond_c IN); neutral => sectors (sigma, dual sigma)
    mats: Dict[Sector, jnp.ndarray] = {}
    for (bkey, c, tr), b in M2.blocks.items():
        sig_r, sig_c = bkey
        mats[sig_r] = b if sig_r not in mats else mats[sig_r] + b
    return mats, Fr, Fc, bond_r, bond_c


def _left_factor(T, nrows, Fr, bond_r, blocks2d, new_bond: Space):
    """Assemble (rows..., new bond OUT) from per-sector matrices.  A
    matrix-like (IN, OUT) 2-leg tensor with dense form Q (x) I_m has block
    Q / c1(sigma) (see mat_coeff)."""
    g = T.group
    blocks = {}
    for sig, m in blocks2d.items():
        blocks[((sig, sig), g.trivial, ())] = m / mat_coeff(g, sig)
    Qm = FusionTensor(g, (bond_r, new_bond), (IN, OUT), blocks, None, None)
    Q = fusion_tensordot(Fr, Qm, axes=([nrows], [0]))
    return Q.project_charge(g.trivial)


def _right_factor(T, nrows, Fc, bond_c, blocks2d, new_bond: Space):
    """Assemble (new bond IN, cols...) from per-sector matrices.

    The (IN, IN) layout shares its signed-pairing structure (scalar
    c2 = +-1/sqrt(qdim)) with the matricization M2; a matrix Y passed here
    produces a factor whose dense form is (Y (x) c2*pairing).  Callers that
    need a dense-row-isometric right factor (lq's Q, svd's Vh) therefore
    pass Y = matrix * sqrt(qdim) and compensate the left/mid factor."""
    g = T.group
    ncols = T.ndim - nrows
    Rm_blocks = {}
    for sig, m in blocks2d.items():
        dsig = g.dual(sig)
        Rm_blocks[((sig, dsig), g.trivial, ())] = m
    Rm = FusionTensor(g, (new_bond, bond_c), (IN, IN), Rm_blocks, None, None)
    R = fusion_tensordot(Rm, Fc, axes=([1], [ncols]))
    return R.project_charge(g.trivial)


def qr(T: FusionTensor, nrows: int):
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Qs, Rs, bond = {}, {}, {}
    for s, m in mats.items():
        q, rr = _qr_reduced(m)
        q, rr = _pos_diag(q, rr)
        Qs[s], Rs[s] = q, rr
        bond[s] = q.shape[1]
    bspace = Space(T.group, bond)
    Q = _left_factor(T, nrows, Fr, bond_r, Qs, bspace)
    R = _right_factor(T, nrows, Fc, bond_c, Rs, bspace)
    return Q, R


def lq(T: FusionTensor, nrows: int):
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Ls, Qs, bond = {}, {}, {}
    for s, m in mats.items():
        qt, rt = _qr_reduced(jnp.conj(m.T))
        qt, rt = _pos_diag(qt, rt)
        # split the structure scalar so Q is dense-row-isometric:
        # L <- L/sqrt(qdim), Q <- Q*sqrt(qdim)  (product unchanged)
        rq = float(np.sqrt(g.qdim(s)))
        Ls[s] = jnp.conj(rt.T) / rq
        Qs[s] = jnp.conj(qt.T) * rq
        bond[s] = qt.shape[1]
    bspace = Space(T.group, bond)
    L = _left_factor(T, nrows, Fr, bond_r, Ls, bspace)
    Q = _right_factor(T, nrows, Fc, bond_c, Qs, bspace)
    return L, Q


def svd(T: FusionTensor, nrows: int):
    """SVD with U/Vh dense-isometric and ``ss`` the per-multiplet Schmidt
    values (each appears qdim times in the dense spectrum)."""
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Us, ss, Vhs, bond = {}, {}, {}, {}
    for s, m in mats.items():
        u, sv, vh = _svd_thin(m)
        rq = float(np.sqrt(g.qdim(s)))
        Us[s], ss[s], Vhs[s] = u, sv / rq, vh * rq
        bond[s] = u.shape[1]
    bspace = Space(T.group, bond)
    U = _left_factor(T, nrows, Fr, bond_r, Us, bspace)
    Vh = _right_factor(T, nrows, Fc, bond_c, Vhs, bspace)
    return U, ss, Vh, bspace


def svd_truncate(T: FusionTensor, nrows: int, trunc: Truncation):
    """Truncated SVD.  Block-level singular values carry a sqrt(qdim)
    relative to the per-multiplet Schmidt coefficients lambda (each dense
    Schmidt value lambda appears qdim times); truncation thresholds compare
    lambda (reference ``truncbelow`` semantics) while the reported error is
    the dense Frobenius loss sqrt(sum_discarded s^2) = sqrt(sum qdim
    lambda^2)."""
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Us, ss, Vhs = {}, {}, {}
    for s, m in mats.items():
        u, sv, vh = _svd_thin(m)
        rq = float(np.sqrt(g.qdim(s)))
        Us[s], ss[s], Vhs[s] = u, sv / rq, vh * rq
    lam_host = {q: np.asarray(s) for q, s in ss.items()}
    counts = trunc.keep_counts(lam_host)
    err_sq = 0.0
    for q, lam in lam_host.items():
        kq = counts.get(q, 0)
        err_sq += float(np.sum(lam[kq:] ** 2)) * g.qdim(q)
    Us_t, ss_t, Vhs_t, bond = {}, {}, {}, {}
    for q, kq in counts.items():
        if kq == 0:
            continue
        Us_t[q] = Us[q][:, :kq]
        ss_t[q] = ss[q][:kq]
        Vhs_t[q] = Vhs[q][:kq, :]
        bond[q] = kq
    bspace = Space(g, bond)
    U = _left_factor(T, nrows, Fr, bond_r, Us_t, bspace)
    Vh = _right_factor(T, nrows, Fc, bond_c, Vhs_t, bspace)
    return U, ss_t, Vh, bspace, float(np.sqrt(err_sq))


def svd_project(T: FusionTensor, nrows: int, bond_space: Space):
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Us, ss, Vhs, bond = {}, {}, {}, {}
    for s, m in mats.items():
        kq = bond_space.dim_of(s)
        if kq == 0:
            continue
        u, sv, vh = _svd_thin(m)
        kq = min(kq, u.shape[1])
        rq = float(np.sqrt(g.qdim(s)))
        Us[s], ss[s], Vhs[s] = u[:, :kq], sv[:kq] / rq, vh[:kq, :] * rq
        bond[s] = kq
    bspace = Space(T.group, bond)
    U = _left_factor(T, nrows, Fr, bond_r, Us, bspace)
    Vh = _right_factor(T, nrows, Fc, bond_c, Vhs, bspace)
    return U, ss, Vh, bspace


def left_null(T: FusionTensor, nrows: int) -> FusionTensor:
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Ns, bond = {}, {}
    for sig, D in tuple(bond_r):
        A = mats.get(sig)
        if A is None:
            N = jnp.eye(D, dtype=T.dtype)
        else:
            An = np.asarray(A)
            q = np.linalg.qr(An, mode="complete")[0]
            N = jnp.asarray(q[:, An.shape[1]:], dtype=T.dtype)
        if N.shape[1] == 0:
            continue
        Ns[sig] = N
        bond[sig] = N.shape[1]
    bspace = Space(g, bond)
    return _left_factor(T, nrows, Fr, bond_r, Ns, bspace)


def right_null(T: FusionTensor, nrows: int) -> FusionTensor:
    """Orthonormal complement of the row space of the matricization:
    N with legs (null bond IN, cols...), T N^dag = 0, N N^dag = I (dense)."""
    g = T.group
    mats, Fr, Fc, bond_r, bond_c = matricize(T, nrows)
    Ns, bond = {}, {}
    for sig_c, D in tuple(bond_c):
        sig_r = g.dual(sig_c)
        A = mats.get(sig_r)
        rq = float(np.sqrt(g.qdim(sig_r)))
        if A is None:
            N = jnp.eye(D, dtype=T.dtype)
        else:
            An = np.asarray(A)
            q = np.linalg.qr(np.conj(An.T), mode="complete")[0]
            N = jnp.asarray(np.conj(q[:, An.shape[0]:].T), dtype=T.dtype)
        if N.shape[0] == 0:
            continue
        Ns[sig_r] = N * rq
        bond[sig_r] = N.shape[0]
    bspace = Space(g, bond)
    return _right_factor(T, nrows, Fc, bond_c, Ns, bspace)


def eigh(T: FusionTensor):
    """Hermitian eigendecomposition of a square 2-leg neutral tensor."""
    assert T.ndim == 2
    _check_neutral(T)
    from .linalg import _eigh_host
    g = T.group
    ws, Vs, bond = {}, {}, {}
    assert T.arrows == (IN, OUT), "eigh expects matrix-like (IN, OUT) layout"
    for (bkey, c, tr), b in T.blocks.items():
        q0, q1 = bkey
        assert q0 == q1, "eigh requires block-diagonal tensor"
        c1 = mat_coeff(g, q0)
        w, v = _eigh_host(b * c1)
        ws[q0], Vs[q0] = w, v / c1
        bond[q0] = b.shape[0]
    bspace = Space(g, bond)
    blocks = {((q, q), g.trivial, ()): v for q, v in Vs.items()}
    V = FusionTensor(g, (T.spaces[0], bspace), (T.arrows[0], OUT), blocks,
                     None, T.dtype)
    return ws, V


def pad_leg(T: FusionTensor, leg: int, new_space: Space,
            offsets: Optional[Dict[Sector, int]] = None) -> FusionTensor:
    offsets = offsets or {}
    blocks = {}
    for (key, c, tr), b in T.blocks.items():
        q = key[leg]
        d_new = new_space.dim_of(q)
        d_old = b.shape[leg]
        off = offsets.get(q, 0)
        if d_new < d_old + off:
            raise ValueError(
                f"pad_leg: sector {q} shrinks ({d_old}+{off} -> {d_new})")
        pad = [(0, 0)] * b.ndim
        pad[leg] = (off, d_new - d_old - off)
        blocks[(key, c, tr)] = jnp.asarray(np.pad(np.asarray(b), pad))
    spaces = list(T.spaces)
    spaces[leg] = new_space
    return FusionTensor(T.group, spaces, T.arrows, blocks, T.charges, T.dtype)


def diag_tensor(group, bond_space: Space, values, dtype=None) -> FusionTensor:
    """Matrix-diagonal (IN, OUT) tensor; dense form diag(v) (x) I_m."""
    blocks = {}
    for q, v in values.items():
        blocks[((q, q), group.trivial, ())] = \
            jnp.diag(jnp.asarray(v)) / mat_coeff(group, q)
    return FusionTensor(group, (bond_space, bond_space), (IN, OUT), blocks,
                        None, dtype)


def bond_identity(group, V: Space, dtype=jnp.float64) -> FusionTensor:
    """Identity morphism on V as a (IN, OUT) 2-leg tensor (dense = delta)."""
    blocks = {}
    for q, d in V:
        blocks[((q, q), group.trivial, ())] = \
            jnp.eye(d, dtype=dtype) / mat_coeff(group, q)
    return FusionTensor(group, (V, V), (IN, OUT), blocks, None, dtype)
