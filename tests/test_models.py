"""Model layer: multi-band mapping, grand-canonical models, golden energies.

Fast tests validate the band-major chain mapping and Hamiltonian
decomposition against hand-built dense operators (independent of the Term
pipeline).  Slow tests reproduce the reference's golden energies
(test/MB.jl:58-66, test/OBC.jl:14-31, test/Spin.jl:41-55).
"""

import numpy as np
import pytest

from hubbardtn_tpu.models.hubbard import MBCSim, MBSim, OBCSim, OBSim, hamiltonian
from hubbardtn_tpu.ops.sites import canonical_site, grand_site

from ed_util import embed_op


def window_from_mpo(H, n):
    return H.to_dense_window(n)


def hop_dense(site, n, a, b, coeff):
    """coeff * sum_s (c+_s(a) c_s(b) + h.c.) with explicit JW strings."""
    out = 0.0
    for s in ("u", "d"):
        cd = embed_op(site, n, a, f"c{s}+") @ embed_op(site, n, b, f"c{s}")
        out = out + coeff * (cd + cd.conj().T)
    return out


def test_mb_decoupled_bands_dense_window():
    """2-band diagonal model == two interleaved Hubbard chains (hand-built)."""
    t = np.hstack([np.zeros((2, 2)), np.diag([1.0, 0.7])])
    u = np.hstack([np.diag([3.0, 2.0]), np.zeros((2, 2))])
    sim = MBSim(t=t, u=u, J=np.zeros((2, 2)), P=1, Q=1)
    assert sim.T == 4  # 2 lattice sites x 2 bands
    H = hamiltonian(sim)
    site = sim.site()
    n = 4  # one unit cell window: 2 lattice sites x 2 bands
    Hw = window_from_mpo(H, n)

    He = np.zeros_like(Hw)
    for band, (tb, ub) in enumerate([(1.0, 3.0), (0.7, 2.0)]):
        # on-site U on both lattice sites of the window
        for s in range(2):
            pos = 2 * s + band
            He = He + ub * (embed_op(site, n, pos, "nup")
                            @ embed_op(site, n, pos, "ndn"))
        # hopping between lattice sites 0 and 1 (chain distance B=2)
        He = He + hop_dense(site, n, band + 2, band, -tb)
    np.testing.assert_allclose(Hw, He, atol=1e-12)


def test_mb_interband_terms_hermitian():
    """Nontrivial interband model compiles to a Hermitian window."""
    t = np.array([[0.5, 0.1, 1.0, 0.5], [0.1, 0.5, 0.5, 1.0]])
    u = np.array([[3.0, 1.0, 0.25, 0.0], [1.0, 3.0, 0.0, 0.25]])
    J = np.array([[0.0, 0.5, 0.1, 0.0], [0.5, 0.0, 0.0, 0.1]])
    U13 = np.array([[0.0, 0.3], [0.3, 0.0]])
    sim = MBSim(t=t, u=u, J=J, U13=U13, P=1, Q=1)
    Hw = window_from_mpo(hamiltonian(sim), 4)
    np.testing.assert_allclose(Hw, Hw.conj().T, atol=1e-12)
    assert np.linalg.norm(Hw) > 1.0


def test_obc_dense_window():
    """Grand-canonical one-band MPO window vs hand-built dense."""
    sim = OBCSim(t=(1.3,), u=(2.5,), mu=0.7)
    assert sim.T == 1
    H = hamiltonian(sim)
    site = sim.site()
    n = 3
    Hw = window_from_mpo(H, n)
    He = np.zeros_like(Hw)
    for s in range(n):
        He = He + 2.5 * (embed_op(site, n, s, "nup")
                         @ embed_op(site, n, s, "ndn"))
        He = He - 0.7 * embed_op(site, n, s, "n")
    for s in range(n - 1):
        He = He + hop_dense(site, n, s, s + 1, -1.3)
    np.testing.assert_allclose(Hw, He, atol=1e-12)


def test_obc_validation():
    with pytest.raises(ValueError):
        OBCSim(t=(1.0,), u=(1.0,))                    # neither mu nor f
    with pytest.raises(ValueError):
        OBCSim(t=(1.0,), u=(1.0,), mu=1.0, f=1.0)     # both
    with pytest.raises(ValueError):
        OBCSim(t=(1.0,), u=(1.0,), f=2.5)             # filling out of range
    with pytest.raises(NotImplementedError):
        OBCSim(t=(1.0,), u=(1.0,), mu=0.5, spin=True)


def test_mbc_model_compiles():
    t = np.hstack([np.diag([0.5, 0.5]), np.eye(2)])
    u = np.hstack([np.eye(2), np.zeros((2, 2))])
    sim = MBCSim(t=t, u=u, J=np.zeros((2, 2)))
    H = hamiltonian(sim)
    assert H.T == 2
    Hw = H.to_dense_window(4)
    np.testing.assert_allclose(Hw, Hw.conj().T, atol=1e-12)


# ----------------------------------------------------------------------
# golden regression values (reference test suite)
# ----------------------------------------------------------------------

@pytest.mark.slow
def test_mb_golden():
    """Reference test/MB.jl:58-66: two decoupled u=3 chains, atol 1e-1."""
    from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
    t = np.hstack([np.zeros((2, 2)), np.eye(2)])
    u = np.hstack([3.0 * np.eye(2), np.zeros((2, 2))])
    sim = MBSim(t=t, u=u, J=np.zeros((2, 2)), P=1, Q=1, bond_dim=4)
    out = compute_groundstate(sim, tol=1e-5, max_rounds=1, round_iters=30,
                              final_iters=50)
    assert abs(out["energy"] - (-0.630375296)) < 1e-1


@pytest.mark.slow
def test_obc_golden_mu_search():
    """Reference test/OBC.jl:14-31: filling-1 mu search, E0+muN, atol 1e-3."""
    from hubbardtn_tpu.algorithms.groundstate import (_mean_filling,
                                                      compute_groundstate)
    sim = OBCSim(t=(1.0,), u=(1.0,), f=1.0, bond_dim=8)
    out = compute_groundstate(sim, tol=1e-7, max_rounds=2, round_iters=25,
                              final_iters=60)
    n = _mean_filling(out)
    E = out["energy"] + out["mu"] * n
    assert abs(n - 1.0) < 1e-8
    assert abs(E - (-1.03541433)) < 1e-3


@pytest.mark.slow
def test_spin_golden_one_band():
    """Reference test/Spin.jl:41-47: u=8 spin-resolved, atol 1e-1."""
    from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
    sim = OBSim(t=(1.0,), u=(8.0,), P=1, Q=1, bond_dim=6, spin=True)
    out = compute_groundstate(sim, tol=1e-5, max_rounds=1, round_iters=30,
                              final_iters=50)
    assert abs(out["energy"] - (-0.32637)) < 1e-1
