"""Unit tests for the symmetric tensor core (the layer the reference gets
from TensorKit; unit tests the reference lacks, per SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.symmetry.groups import FERMION_SPIN_CHARGE as G
from hubbardtn_tpu.symmetry.spaces import Space, one
from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor, tensordot, trace_all
from hubbardtn_tpu.tensor import linalg as tla


def sp(*items):
    return Space(G, dict(items))


V1 = sp(((0, 0, 0), 2), ((1, 1, 1), 3), ((1, -1, 1), 1))
V2 = sp(((0, 0, 0), 1), ((1, 1, 1), 2), ((0, 0, 2), 2))


class TestSpaces:
    def test_fuse_dims(self):
        f = V1.fuse(V2)
        assert f.total_dim == V1.total_dim * V2.total_dim
        assert f.dim_of((1, 1, 1)) == 2 * 2 + 3 * 1  # (0,0,0)x(1,1,1) + (1,1,1)x(0,0,0)

    def test_dual(self):
        d = V1.dual()
        assert d.dim_of((1, -1, -1)) == 3
        assert d.dual() == V1

    def test_infimum_oplus_cap(self):
        i = V1.infimum(V2)
        assert i.dim_of((0, 0, 0)) == 1 and i.dim_of((1, 1, 1)) == 2
        assert i.dim_of((1, -1, 1)) == 0
        o = V1.oplus(V2)
        assert o.total_dim == V1.total_dim + V2.total_dim
        assert V1.cap(1).dim_of((1, 1, 1)) == 1

    def test_hashable(self):
        assert hash(V1) == hash(sp(((1, 1, 1), 3), ((0, 0, 0), 2), ((1, -1, 1), 1)))


class TestSymTensor:
    def test_dense_roundtrip(self):
        t = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=1)
        d = t.to_dense()
        t2 = SymTensor.from_dense(G, (V1, V2, V1), (IN, IN, OUT), d)
        np.testing.assert_allclose(t2.to_dense(), d)

    def test_charge_conservation_enumeration(self):
        t = SymTensor.zeros(G, (V1, V1), (OUT, IN))
        # diagonal keys only for charge-neutral 2-leg op on same space
        for q0, q1 in t.blocks:
            assert q0 == q1

    def test_tensordot_matches_dense(self):
        A = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=2)
        B = SymTensor.random(G, (V1, V2, V2), (IN, OUT, IN), seed=3)
        C = tensordot(A, B, axes=([2, 1], [0, 1]))
        dense = np.tensordot(A.to_dense(), B.to_dense(), axes=([2, 1], [0, 1]))
        np.testing.assert_allclose(C.to_dense(), dense, atol=1e-12)

    def test_tensordot_arrow_check(self):
        A = SymTensor.random(G, (V1,), (OUT,), seed=4)
        B = SymTensor.random(G, (V1,), (OUT,), seed=5)
        with pytest.raises(ValueError):
            tensordot(A, B, axes=([0], [0]))

    def test_charged_tensor(self):
        c = (1, 1, 1)
        t = SymTensor.random(G, (V1, V1), (OUT, IN), charge=c, seed=6)
        assert t.blocks  # nonempty
        for q0, q1 in t.blocks:
            assert G.fuse(q0, G.dual(q1)) == c

    def test_conj_transpose_adjoint(self):
        t = SymTensor.random(G, (V1, V1), (OUT, IN), seed=7)
        td = t.conj().transpose((1, 0))
        np.testing.assert_allclose(td.to_dense(), t.to_dense().conj().T, atol=1e-14)

    def test_flip_arrow_roundtrip(self):
        t = SymTensor.random(G, (V1, V2), (OUT, IN), seed=8)
        t2 = t.flip_arrow(0).flip_arrow(0)
        assert t2.spaces == t.spaces and t2.arrows == t.arrows
        np.testing.assert_allclose(t2.to_dense(), t.to_dense())

    def test_add_scale_norm_inner(self):
        a = SymTensor.random(G, (V1, V2), (OUT, IN), seed=9)
        b = SymTensor.random(G, (V1, V2), (OUT, IN), seed=10)
        np.testing.assert_allclose((a + 2.0 * b).to_dense(), a.to_dense() + 2 * b.to_dense())
        np.testing.assert_allclose(float(a.norm()), np.linalg.norm(a.to_dense()))
        np.testing.assert_allclose(
            complex(a.inner(b)), np.vdot(a.to_dense(), b.to_dense()), atol=1e-12
        )

    def test_trace(self):
        t = SymTensor.random(G, (V1, V1), (OUT, IN), seed=11)
        np.testing.assert_allclose(complex(trace_all(t)), np.trace(t.to_dense()), atol=1e-12)

    def test_pytree(self):
        t = SymTensor.random(G, (V1, V2), (OUT, IN), seed=12)
        t2 = jax.tree_util.tree_map(lambda x: 2 * x, t)
        np.testing.assert_allclose(t2.to_dense(), 2 * t.to_dense())

        @jax.jit
        def f(x):
            return x.norm_sq()

        np.testing.assert_allclose(float(f(t)), float(t.norm_sq()))


class TestLinalg:
    def test_qr_reconstruct_isometry(self):
        t = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=13)
        Q, R = tla.qr(t, 2)
        recon = tensordot(Q, R, axes=([2], [0]))
        np.testing.assert_allclose(recon.to_dense(), t.to_dense(), atol=1e-12)
        # isometry: Q^dag Q = I
        qdq = tensordot(Q.conj(), Q, axes=([0, 1], [0, 1]))
        for (q0, q1), b in qdq.blocks.items():
            assert q0 == q1
            np.testing.assert_allclose(np.asarray(b), np.eye(b.shape[0]), atol=1e-12)

    def test_lq_reconstruct(self):
        t = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=14)
        L, Q = tla.lq(t, 1)
        recon = tensordot(L, Q, axes=([1], [0]))
        np.testing.assert_allclose(recon.to_dense(), t.to_dense(), atol=1e-12)
        qqd = tensordot(Q, Q.conj(), axes=([1, 2], [1, 2]))
        for (q0, q1), b in qqd.blocks.items():
            np.testing.assert_allclose(np.asarray(b), np.eye(b.shape[0]), atol=1e-12)

    def test_svd_reconstruct(self):
        t = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=15)
        U, ss, Vh, bond = tla.svd(t, 2)
        S = tla.diag_tensor(G, bond, ss)
        recon = tensordot(tensordot(U, S, axes=([2], [0])), Vh, axes=([2], [0]))
        np.testing.assert_allclose(recon.to_dense(), t.to_dense(), atol=1e-11)

    def test_svd_truncate(self):
        t = SymTensor.random(G, (V1, V2, V1), (IN, IN, OUT), seed=16)
        U, ss, Vh, bond, err = tla.svd_truncate(t, 2, tla.Truncation(max_dim=3))
        assert bond.total_dim <= 3
        # err equals Frobenius distance of reconstruction
        S = tla.diag_tensor(G, bond, ss)
        recon = tensordot(tensordot(U, S, axes=([2], [0])), Vh, axes=([2], [0]))
        np.testing.assert_allclose(
            np.linalg.norm(recon.to_dense() - t.to_dense()), err, atol=1e-10
        )

    def test_svd_truncate_cutoff(self):
        t = SymTensor.random(G, (V1, V1), (IN, OUT), seed=17)
        _, ss, _, _, _ = tla.svd_truncate(t, 1, tla.Truncation(cutoff=1.0))
        for s in ss.values():
            assert np.all(np.asarray(s) >= 1.0)

    def test_eigh(self):
        t = SymTensor.random(G, (V1, V1), (OUT, IN), seed=18)
        h = t + t.conj().transpose((1, 0))
        ws, V = tla.eigh(h)
        wd = np.sort(np.concatenate([np.asarray(w) for w in ws.values()]))
        np.testing.assert_allclose(wd, np.sort(np.linalg.eigvalsh(h.to_dense())), atol=1e-11)
