"""Krylov solvers on known matrices: host-loop vs fully-jitted restarts.

The jitted-restart variants (one XLA dispatch + one scalar host sync per
restart) must agree with dense eigensolves/solves to solver tolerance —
including after Lanczos breakdown (invariant subspace), where the masked
tridiagonal must not surface spurious penalty eigenvalues.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.solvers.krylov import (gmres, gmres_plan, lanczos_ground,
                                          lanczos_ground_plan)


class MatPlan:
    """Hashable dense-matrix matvec plan (test double for PaddedHAC)."""

    def __init__(self, tag):
        self.tag = tag

    def matvec(self, v, A):
        return A @ v

    def __hash__(self):
        return hash(("mat", self.tag))

    def __eq__(self, other):
        return isinstance(other, MatPlan) and self.tag == other.tag


def _hermitian(n, seed, complex_=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    if complex_:
        A = A + 1j * rng.standard_normal((n, n))
    return 0.5 * (A + A.conj().T)


@pytest.mark.parametrize("complex_", [False, True])
def test_lanczos_plan_matches_dense(complex_):
    A = _hermitian(60, 0, complex_)
    v0 = np.random.default_rng(1).standard_normal(60).astype(A.dtype)
    theta, v, info = lanczos_ground_plan(MatPlan(0), (jnp.asarray(A),),
                                         jnp.asarray(v0), krylov_dim=20,
                                         tol=1e-10, max_restarts=50)
    w = np.linalg.eigvalsh(A)
    assert abs(theta - w[0]) < 1e-8
    r = A @ np.asarray(v) - theta * np.asarray(v)
    assert np.linalg.norm(r) < 1e-7


def test_lanczos_plan_matches_host_loop():
    A = _hermitian(40, 3)
    v0 = np.random.default_rng(4).standard_normal(40)
    t1, _, _ = lanczos_ground(lambda v: jnp.asarray(A) @ v, jnp.asarray(v0),
                              krylov_dim=16, tol=1e-10, max_restarts=50)
    t2, _, _ = lanczos_ground_plan(MatPlan(1), (jnp.asarray(A),),
                                   jnp.asarray(v0), krylov_dim=16,
                                   tol=1e-10, max_restarts=50)
    assert abs(t1 - t2) < 1e-8


def test_lanczos_breakdown_invariant_subspace():
    """Start in an exact 2-dim invariant subspace with POSITIVE eigenvalues:
    breakdown at step 2 must not leak the 1e30 penalty rows nor a spurious
    zero eigenvalue below the true minimum."""
    d = np.array([5.0, 7.0, 11.0, 13.0])
    A = np.diag(d)
    v0 = np.array([1.0, 1.0, 0.0, 0.0])
    theta, v, info = lanczos_ground_plan(MatPlan(2), (jnp.asarray(A),),
                                         jnp.asarray(v0), krylov_dim=8,
                                         tol=1e-10, max_restarts=5)
    assert abs(theta - 5.0) < 1e-9          # min over the invariant subspace
    assert abs(abs(np.asarray(v)[0]) - 1.0) < 1e-8


@pytest.mark.parametrize("complex_", [False, True])
def test_gmres_plan_matches_dense(complex_):
    rng = np.random.default_rng(7)
    n = 50
    # keep the field of values in the right half plane (restarted GMRES
    # stagnates on indefinite operators regardless of implementation)
    A = np.eye(n) + 0.12 * rng.standard_normal((n, n))
    if complex_:
        A = A + 0.05j * rng.standard_normal((n, n))
    b = rng.standard_normal(n).astype(A.dtype)
    x, info = gmres_plan(MatPlan(3), (jnp.asarray(A),), jnp.asarray(b),
                         krylov_dim=25, tol=1e-12, max_restarts=20)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-9 * np.linalg.norm(b)
    # agrees with the host-loop gmres
    x2, _ = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                  krylov_dim=25, tol=1e-12, max_restarts=20)
    assert np.linalg.norm(np.asarray(x) - np.asarray(x2)) < 1e-7


def test_lanczos_early_exit_on_converged_start():
    """Warm start at an exact eigenvector with atol set: the device
    while_loop must close the recurrence after ~1 matvec (j_end << k) and
    still return the exact eigenvalue — the latency win that makes
    steady-state VUMPS eigensolves ~1 matvec instead of krylov_dim."""
    from hubbardtn_tpu.solvers.krylov import _lanczos_restart_plan
    A = _hermitian(40, 11)
    w, U = np.linalg.eigh(A)
    v0 = jnp.asarray(U[:, 0])
    theta, v, resid, j_end = _lanczos_restart_plan(
        v0, (jnp.asarray(A),), plan=MatPlan(40), k=20, atol=1e-10)
    assert int(j_end) <= 2
    assert abs(float(theta) - w[0]) < 1e-9
    assert float(resid) < 1e-9


def test_lanczos_early_exit_matches_exhaustive():
    """With a loose atol the early-exit restart must agree with the
    atol=None exhaustive restart to that tolerance."""
    from hubbardtn_tpu.solvers.krylov import _lanczos_restart_plan
    A = _hermitian(50, 17)
    v0 = jnp.asarray(np.random.default_rng(2).standard_normal(50))
    t1, _, _, j1 = _lanczos_restart_plan(v0, (jnp.asarray(A),),
                                         plan=MatPlan(41), k=25)
    t2, _, r2, j2 = _lanczos_restart_plan(v0, (jnp.asarray(A),),
                                          plan=MatPlan(41), k=25, atol=1e-6)
    assert int(j1) == 25                       # no atol: runs all k steps
    assert int(j2) <= int(j1)
    assert abs(float(t1) - float(t2)) < 1e-5


def test_gmres_early_exit_warm_start():
    """Warm start at the exact solution: the Givens-tracked residual is
    below atol at j=0, so the loop exits without a single Arnoldi step and
    returns the warm start unchanged."""
    from hubbardtn_tpu.solvers.krylov import _gmres_restart_plan
    rng = np.random.default_rng(23)
    n = 40
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    x_exact = jnp.asarray(np.linalg.solve(A, b))
    x, resid, j_end = _gmres_restart_plan(
        x_exact, jnp.asarray(b), (jnp.asarray(A),), plan=MatPlan(42), k=20,
        atol=1e-8 * np.linalg.norm(b))
    assert int(j_end) == 0
    assert float(resid) < 1e-8 * np.linalg.norm(b)
    assert np.linalg.norm(np.asarray(x) - np.asarray(x_exact)) < 1e-10


def test_gmres_early_exit_partial_solve():
    """A mid-loop exit (0 < j_end < k) must still assemble the correct
    minimal-residual update from the masked triangular solve, with the
    Givens-tracked residual matching the true residual."""
    from hubbardtn_tpu.solvers.krylov import _gmres_restart_plan
    rng = np.random.default_rng(29)
    n = 60
    A = np.eye(n) + 0.08 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    atol = 1e-6 * np.linalg.norm(b)
    x, resid, j_end = _gmres_restart_plan(
        jnp.zeros(n), jnp.asarray(b), (jnp.asarray(A),), plan=MatPlan(43),
        k=50, atol=atol)
    assert 0 < int(j_end) < 50
    true_res = np.linalg.norm(A @ np.asarray(x) - b)
    assert abs(true_res - float(resid)) < 1e-9 * np.linalg.norm(b)
    assert true_res <= atol * (1 + 1e-9)


# ----------------------------------------------------------------------
# Arnoldi (general, non-Hermitian capable)
# ----------------------------------------------------------------------

def test_arnoldi_nonhermitian_real_spectrum():
    """Similarity transform of a real diagonal: non-Hermitian operator whose
    exact spectrum is known; Arnoldi must find the 3 smallest-real
    eigenvalues where Lanczos assumptions fail."""
    from hubbardtn_tpu.solvers.krylov import arnoldi_eig
    rng = np.random.default_rng(0)
    n = 60
    D = np.diag(np.sort(rng.standard_normal(n)) * 3)
    S = np.eye(n) + 0.3 * rng.standard_normal((n, n))
    A = jnp.asarray(S @ D @ np.linalg.inv(S))
    v0 = jnp.asarray(rng.standard_normal(n) + 0j)
    ws, vs, info = arnoldi_eig(lambda x: A @ x, v0, num=3, krylov_dim=25,
                               tol=1e-9)
    exact = np.sort(np.diag(D))[:3]
    np.testing.assert_allclose(np.sort(ws.real), exact, atol=1e-6)
    assert info["resid"] < 1e-9
    # returned vectors are genuine eigenvectors
    for w, v in zip(ws, vs):
        r = np.asarray(A @ v - w * v)
        assert np.linalg.norm(r) < 1e-6


def test_arnoldi_matches_lanczos_hermitian():
    from hubbardtn_tpu.solvers.krylov import arnoldi_eig, lanczos_ground
    rng = np.random.default_rng(3)
    n = 40
    B = rng.standard_normal((n, n))
    B = jnp.asarray((B + B.T) / 2)
    v0 = jnp.asarray(rng.standard_normal(n))
    wl, _, _ = lanczos_ground(lambda x: B @ x, v0, krylov_dim=20, tol=1e-10)
    wa, _, _ = arnoldi_eig(lambda x: B @ x, v0, num=1, krylov_dim=20,
                           tol=1e-10)
    assert abs(wl - wa[0].real) < 1e-8 and abs(wa[0].imag) < 1e-10


def test_arnoldi_complex_pair():
    """A rotation block has eigenvalues +/-i: genuinely complex spectrum the
    Hermitian solvers cannot represent."""
    from hubbardtn_tpu.solvers.krylov import arnoldi_eig
    rng = np.random.default_rng(5)
    C = np.zeros((4, 4))
    C[0, 1], C[1, 0], C[2, 2], C[3, 3] = -1.0, 1.0, 2.0, 3.0
    Cj = jnp.asarray(C + 0j)
    ws, _, _ = arnoldi_eig(lambda x: Cj @ x,
                           jnp.asarray(rng.standard_normal(4) + 0j),
                           num=2, krylov_dim=4, tol=1e-10, which="sm")
    np.testing.assert_allclose(np.sort(np.abs(ws)), [1.0, 1.0], atol=1e-8)
    np.testing.assert_allclose(np.sort(ws.imag), [-1.0, 1.0], atol=1e-8)


def test_lanczos_ground_batched_matches_dense():
    """Per-lane smallest eigenpairs of K independent Hermitian operators:
    the batched recurrence (one matvec per step for all lanes) must agree
    with dense eigh per lane, converge lanes independently, and return
    genuine eigenvectors."""
    from hubbardtn_tpu.solvers.krylov import lanczos_ground_batched
    rng = np.random.default_rng(9)
    K, n = 4, 30
    As = []
    for k in range(K):
        B = rng.standard_normal((n, n))
        # spread the difficulty: scale lane k's spectrum differently
        As.append((B + B.T) / 2 * (1.0 + k))
    A = jnp.asarray(np.stack(As))
    V0 = jnp.asarray(rng.standard_normal((K, n)))

    def mv_b(V):
        return jnp.einsum("kij,kj->ki", A, V)

    th, V, info = lanczos_ground_batched(mv_b, V0, krylov_dim=12, tol=1e-10,
                                         max_restarts=60)
    exact = np.array([np.linalg.eigh(a)[0][0] for a in As])
    np.testing.assert_allclose(th, exact, atol=1e-8)
    assert np.all(info["resid"] < 1e-10)
    for k in range(K):
        v = np.asarray(V[k])
        r = As[k] @ v - th[k] * v
        assert np.linalg.norm(r) < 1e-7


def test_lanczos_ground_batched_matches_serial():
    from hubbardtn_tpu.solvers.krylov import (lanczos_ground,
                                              lanczos_ground_batched)
    rng = np.random.default_rng(13)
    K, n = 3, 25
    As = [(lambda B: (B + B.conj().T) / 2)(
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
        for _ in range(K)]
    A = jnp.asarray(np.stack(As))
    V0h = rng.standard_normal((K, n)) + 1j * rng.standard_normal((K, n))
    V0 = jnp.asarray(V0h)
    th_b, _, _ = lanczos_ground_batched(
        lambda V: jnp.einsum("kij,kj->ki", A, V), V0, krylov_dim=10,
        tol=1e-11, max_restarts=80)
    for k in range(K):
        w, _, _ = lanczos_ground(lambda x, _A=A[k]: _A @ x, V0[k],
                                 krylov_dim=10, tol=1e-11, max_restarts=80)
        assert abs(th_b[k] - w) < 1e-9


def test_arnoldi_eig_batched_matches_serial():
    """Batched restarted Arnoldi: per-lane smallest-real-part eigenpairs of
    K independent NON-Hermitian operators agree with the serial solver and
    with dense eig, and the returned vectors are genuine eigenvectors."""
    from hubbardtn_tpu.solvers.krylov import arnoldi_eig, arnoldi_eig_batched
    rng = np.random.default_rng(21)
    K, n = 3, 24
    As = [rng.standard_normal((n, n)) + 0.2j * rng.standard_normal((n, n))
          for _ in range(K)]
    A = jnp.asarray(np.stack(As))
    V0 = jnp.asarray(rng.standard_normal((K, n))
                     + 1j * rng.standard_normal((K, n)))

    def mv_b(V):
        return jnp.einsum("kij,kj->ki", A, V)

    ws_b, vs_b, info = arnoldi_eig_batched(mv_b, V0, num=1, krylov_dim=14,
                                           tol=1e-10, which="sr",
                                           max_restarts=100)
    for k in range(K):
        exact = np.linalg.eigvals(As[k])
        lo = exact[np.argmin(np.real(exact))]
        assert abs(ws_b[k, 0] - lo) < 1e-7, k
        ws_s, _, _ = arnoldi_eig(lambda x, _A=As[k]: jnp.asarray(_A) @ x,
                                 V0[k], num=1, krylov_dim=14, tol=1e-10,
                                 which="sr", max_restarts=100)
        assert abs(ws_b[k, 0] - ws_s[0]) < 1e-7, k
        v = np.asarray(vs_b[0][k])
        r = As[k] @ v - complex(ws_b[k, 0]) * v
        assert np.linalg.norm(r) < 1e-6, k


def test_arnoldi_eig_batched_num2_deflation():
    """num=2 batched: the two smallest-real-part eigenvalues per lane come
    out of the Schur->eigenvector transform as genuine eigenpairs."""
    from hubbardtn_tpu.solvers.krylov import arnoldi_eig_batched
    rng = np.random.default_rng(5)
    K, n = 3, 20
    As = [rng.standard_normal((n, n)) + 0.1j * rng.standard_normal((n, n))
          for _ in range(K)]
    A = jnp.asarray(np.stack(As))
    V0 = jnp.asarray(rng.standard_normal((K, n))
                     + 1j * rng.standard_normal((K, n)))
    ws, vs, _ = arnoldi_eig_batched(
        lambda V: jnp.einsum("kij,kj->ki", A, V), V0, num=2, krylov_dim=12,
        tol=1e-10, which="sr", max_restarts=120)
    for k in range(K):
        exact = np.linalg.eigvals(As[k])
        lo2 = exact[np.argsort(np.real(exact))[:2]]
        np.testing.assert_allclose(np.sort(np.real(ws[k])),
                                   np.sort(np.real(lo2)), atol=1e-6)
        for s in range(2):
            v = np.asarray(vs[s][k])
            r = As[k] @ v - complex(ws[k, s]) * v
            assert np.linalg.norm(r) < 1e-5, (k, s)
