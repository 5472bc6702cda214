"""SU(2) fusion-tree tensor core: numeric engine vs dense arrays.

The FusionTensor engine computes every recoupling coefficient numerically
from CG chains (symmetry/trees.py); these tests pin the conventions by
comparing whole-tensor operations against plain dense numpy contractions.
"""

import numpy as np
import pytest

from hubbardtn_tpu.symmetry.groups import FERMION_SU2, FERMION_SU2_CHARGE
from hubbardtn_tpu.symmetry.spaces import Space
from hubbardtn_tpu.symmetry.su2 import allowed_couplings, cg_array, conj_mat
from hubbardtn_tpu.symmetry.trees import (enumerate_trees, overlap_matrix,
                                          tree_tensor)
from hubbardtn_tpu.tensor.fusion import (IN, OUT, FusionTensor,
                                         fusion_tensordot)

G = FERMION_SU2
V1 = Space(G, {(0, 0): 2, (1, 1): 1, (0, 2): 1})
V2 = Space(G, {(0, 0): 1, (1, 1): 2})


def _jmats(tj):
    j = tj / 2
    m = np.arange(tj + 1) - j
    jz = np.diag(m)
    jp = np.zeros((tj + 1, tj + 1))
    for i in range(tj):
        jp[i + 1, i] = np.sqrt(j * (j + 1) - m[i] * (m[i] + 1))
    return jz, jp


def test_cg_orthonormal_complete_equivariant():
    rng = np.random.default_rng(0)
    for tj1 in range(4):
        for tj2 in range(4):
            mats = []
            z1, p1 = _jmats(tj1)
            z2, p2 = _jmats(tj2)
            for tJ in allowed_couplings(tj1, tj2):
                C = cg_array(tj1, tj2, tJ)
                F = C.reshape(-1, tJ + 1)
                assert np.allclose(F.T @ F, np.eye(tJ + 1), atol=1e-12)
                mats.append(F)
                zJ, pJ = _jmats(tJ)
                for A1, A2, AJ in ((z1, z2, zJ), (p1, p2, pJ)):
                    lhs = (np.einsum("ab,bcM->acM", A1, C)
                           + np.einsum("cb,abM->acM", A2, C))
                    rhs = np.einsum("abN,NM->abM", C, AJ)
                    assert np.allclose(lhs, rhs, atol=1e-12)
            U = np.concatenate(mats, axis=1)
            assert np.allclose(U @ U.T, np.eye(U.shape[0]), atol=1e-12)


def test_tree_basis_orthonormal():
    rng = np.random.default_rng(1)
    for _ in range(60):
        n = rng.integers(1, 5)
        tjs = tuple(int(x) for x in rng.integers(0, 4, n))
        arrows = tuple(bool(x) for x in rng.integers(0, 2, n))
        charges = set()

        def rec(k, x):
            if k == n:
                charges.add(x)
                return
            for y in allowed_couplings(x, tjs[k]):
                rec(k + 1, y)

        rec(1, tjs[0])
        for tjc in charges:
            Gm = overlap_matrix(tjs, arrows, tjc)
            assert np.allclose(Gm, np.eye(Gm.shape[0]), atol=1e-11)
        # completeness: dims add up to the full tensor product
        tot = sum(len(enumerate_trees(tjs, c)) * (c + 1) for c in charges)
        assert tot == int(np.prod([t + 1 for t in tjs]))


def test_roundtrip_and_norm():
    A = FusionTensor.random(G, (V1, V2, V1), (IN, OUT, OUT), seed=1)
    D = A.to_dense()
    A2 = FusionTensor.from_dense(G, A.spaces, A.arrows, D)
    for k in A.blocks:
        np.testing.assert_allclose(A.blocks[k], A2.blocks[k], atol=1e-12)
    assert np.isclose(float(A.norm_sq()), np.sum(D ** 2), atol=1e-10)


def test_roundtrip_charged():
    B = FusionTensor.random(G, (V1, V2), (OUT, IN), charge=(1, 1), seed=2)
    DB = B.to_dense()
    assert DB.shape[-1] == 2  # doublet M-axis
    B2 = FusionTensor.from_dense(G, B.spaces, B.arrows, DB, charge=(1, 1))
    for k in B.blocks:
        np.testing.assert_allclose(B.blocks[k], B2.blocks[k], atol=1e-12)


def test_tensordot_matches_dense():
    A = FusionTensor.random(G, (V1, V2, V1), (IN, OUT, OUT), seed=1)
    C = FusionTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=3)
    out = fusion_tensordot(A, C, axes=([1, 2], [1, 0]))
    Dout = out.project_charge(G.trivial).to_dense()
    Dref = np.tensordot(A.to_dense(), C.to_dense(), axes=([1, 2], [1, 0]))
    np.testing.assert_allclose(Dout, Dref, atol=1e-10)


def test_closure_conj_inner():
    A = FusionTensor.random(G, (V1, V2, V1), (IN, OUT, OUT), seed=1)
    D = A.to_dense()
    sc = fusion_tensordot(A, A.conj(), axes=([0, 1, 2], [0, 1, 2]))
    assert np.isclose(float(np.real(sc.scalar())), np.sum(D ** 2), atol=1e-10)
    # conj of a neutral tensor is the dense conjugate
    np.testing.assert_allclose(A.conj().to_dense(), np.conj(D), atol=1e-12)
    # involution on neutral tensors
    Acc = A.conj().conj()
    for k in A.blocks:
        np.testing.assert_allclose(A.blocks[k], Acc.blocks[k], atol=1e-12)
    A3 = FusionTensor.random(G, A.spaces, A.arrows, seed=9)
    assert np.isclose(float(A.inner(A3)), np.sum(D * A3.to_dense()),
                      atol=1e-10)


def test_transpose_matches_dense():
    A = FusionTensor.random(G, (V1, V2, V1), (IN, OUT, OUT), seed=4)
    P = (2, 0, 1)
    np.testing.assert_allclose(A.transpose(P).to_dense(),
                               np.transpose(A.to_dense(), P), atol=1e-12)
    # transpose round trip
    Pinv = tuple(np.argsort(P))
    At = A.transpose(P).transpose(Pinv)
    for k in A.blocks:
        np.testing.assert_allclose(A.blocks[k], At.blocks[k], atol=1e-12)


def test_flip_arrow_contraction_invariance():
    A = FusionTensor.random(G, (V1, V2, V1), (IN, OUT, OUT), seed=1)
    C = FusionTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=3)
    r1 = fusion_tensordot(A, C, axes=([1], [1])).project_charge(G.trivial)
    r2 = fusion_tensordot(A.flip_arrow(1), C.flip_arrow(1),
                          axes=([1], [1])).project_charge(G.trivial)
    np.testing.assert_allclose(r1.to_dense(), r2.to_dense(), atol=1e-12)


def test_charged_times_charged_outcomes():
    """Hidden charges fuse like a leg: doublet x doublet -> singlet+triplet,
    and the components are orthogonal charge sectors."""
    B = FusionTensor.random(G, (V1, V2), (OUT, IN), charge=(1, 1), seed=2)
    Bc = B.conj()
    out = fusion_tensordot(B, Bc, axes=([0, 1], [0, 1]))
    cs = set(c for (_, c, _) in out.blocks.keys())
    assert cs <= {(0, 0), (0, 2)}


# ----------------------------------------------------------------------
# factorizations (fusion_linalg)
# ----------------------------------------------------------------------

from hubbardtn_tpu.symmetry.groups import FERMION_SU2_CHARGE as GC
from hubbardtn_tpu.tensor import fusion_linalg as fla

W1 = Space(GC, {(0, 0, -1): 1, (1, 1, 0): 2, (0, 0, 1): 2, (0, 2, 0): 1})
W2 = Space(GC, {(0, 0, 0): 1, (1, 1, 1): 2, (0, 2, -1): 1})


def _matlike_eye_check(QQ, g):
    for (bk, c, tr), b in QQ.blocks.items():
        if c != g.trivial:
            continue
        q0, q1 = bk
        bm = np.asarray(b) * fla.mat_coeff(g, q0)
        assert q0 == q1
        np.testing.assert_allclose(bm, np.eye(bm.shape[0]), atol=1e-10)


@pytest.mark.heavy
def test_fusion_qr_lq_svd_null():
    T = FusionTensor.random(GC, (W1, W2, W1), (IN, OUT, OUT), seed=5)
    D = T.to_dense()

    Q, R = fla.qr(T, 2)
    _matlike_eye_check(fusion_tensordot(Q.conj(), Q, axes=([0, 1], [0, 1])), GC)
    TR = fusion_tensordot(Q, R, axes=([2], [0])).project_charge(GC.trivial)
    np.testing.assert_allclose(TR.to_dense(), D, atol=1e-10)

    L, Q2 = fla.lq(T, 1)
    TR2 = fusion_tensordot(L, Q2, axes=([1], [0])).project_charge(GC.trivial)
    np.testing.assert_allclose(TR2.to_dense(), D, atol=1e-10)

    U, ss, Vh, bsp = fla.svd(T, 2)
    mid = fla.diag_tensor(GC, bsp, ss)
    rec = fusion_tensordot(fusion_tensordot(U, mid, axes=([2], [0])), Vh,
                           axes=([2], [0])).project_charge(GC.trivial)
    np.testing.assert_allclose(rec.to_dense(), D, atol=1e-10)

    N = fla.left_null(T, 2)
    NT = fusion_tensordot(N.conj(), T, axes=([0, 1], [0, 1]))
    mx = max((float(np.max(np.abs(b))) for b in NT.blocks.values()),
             default=0.0)
    assert mx < 1e-10
    _matlike_eye_check(fusion_tensordot(N.conj(), N, axes=([0, 1], [0, 1])), GC)


def test_fusion_identity_and_qdim_trace():
    I = fla.bond_identity(GC, W1)
    X = FusionTensor.random(GC, (W1, W2), (IN, OUT), seed=7)
    IX = fusion_tensordot(I, X, axes=([1], [0])).project_charge(GC.trivial)
    np.testing.assert_allclose(IX.to_dense(), X.to_dense(), atol=1e-12)
    # categorical trace of the identity = dense (qdim-weighted) dimension
    tr = fusion_tensordot(I, fla.bond_identity(GC, W1),
                          axes=([0, 1], [1, 0])).scalar()
    assert np.isclose(float(tr), W1.dense_dim, atol=1e-10)


def test_fusion_svd_truncate():
    from hubbardtn_tpu.tensor.linalg import Truncation
    T = FusionTensor.random(GC, (W1, W2, W1), (IN, OUT, OUT), seed=11)
    U, ss, Vh, bsp, err = fla.svd_truncate(T, 2, Truncation(max_dim=3))
    assert sum(d for _, d in bsp) <= 3
    # discarded weight accounts for qdim multiplicities: reconstruct
    mid = fla.diag_tensor(GC, bsp, ss)
    rec = fusion_tensordot(fusion_tensordot(U, mid, axes=([2], [0])), Vh,
                           axes=([2], [0])).project_charge(GC.trivial)
    diff = np.linalg.norm(rec.to_dense() - T.to_dense())
    assert np.isclose(diff, err, rtol=1e-6)
