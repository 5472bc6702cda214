"""SU(2) fusion-tree pipeline: symmetrized MPO + VUMPS ground state.

Gate: the channel-leg SU(2) MPO must reproduce the abelian (U(1)-Sz) MPO's
dense Hamiltonian windows exactly, and the SU(2) VUMPS path must reproduce
the reference golden energy (test/OB.jl:21-31) like the abelian path does.
"""

import numpy as np
import pytest

from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian, one_band_terms
from hubbardtn_tpu.mpo.fsm import mpo_from_terms
from hubbardtn_tpu.mpo.su2_compile import (_fixed_basis_indices,
                                           build_mpo_su2, su2_dense_window,
                                           symmetrize_terms)
from hubbardtn_tpu.ops.fermions import compile_terms
from hubbardtn_tpu.ops.sites import canonical_site
from hubbardtn_tpu.ops.sites_su2 import canonical_su2_site


def _window_check(sim, P, Q, windows):
    terms = one_band_terms(sim)
    ab_site = canonical_site(P, Q)
    su_site = canonical_su2_site(P, Q)
    su_terms = symmetrize_terms(ab_site, su_site, compile_terms(ab_site, terms))
    H_ab = mpo_from_terms(ab_site, sim.T, terms)
    H_su = build_mpo_su2(su_site, sim.T, su_terms)
    idx_ab = _fixed_basis_indices(ab_site)
    P_ab = np.zeros((4, 4))
    for new, old in enumerate(idx_ab):
        P_ab[new, old] = 1.0
    P_su = np.zeros((4, 4))
    for new, old in enumerate(su_site.perm):
        P_su[new, old] = 1.0
    Pc = P_su @ P_ab.T
    for n in windows:
        Wab = np.real(np.asarray(H_ab.to_dense_window(n)))
        K = np.eye(1)
        for _ in range(n):
            K = np.kron(K, Pc)
        Wsu = su2_dense_window(H_su, n)
        np.testing.assert_allclose(K @ Wab @ K.T, Wsu, atol=1e-10)


def test_su2_mpo_window_matches_abelian_basic():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    _window_check(sim, 1, 1, (2, 3, 4))


def test_su2_mpo_window_matches_abelian_rich():
    sim = OBSim(t=(1.0, 0.3), u=(5.0, 1.0), J=(0.4,), U13=(0.2,), P=1, Q=1)
    _window_check(sim, 1, 1, (3,))


def test_su2_mpo_window_fractional_filling():
    sim = OBSim(t=(1.0,), u=(2.0,), P=3, Q=2)
    _window_check(sim, 3, 2, (4,))


@pytest.mark.slow
def test_su2_vumps_golden_u2():
    """Reference test/OB.jl:21-31 golden E(u=2) via the SU(2) backend."""
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=4,
                         seed=3)
    res = vumps(psi, H, tol=1e-7, maxiter=60)
    assert abs(res.energy - (-0.84163698)) < 1e-2
    # same physics as the abelian backend at comparable effective bond
    sim_ab = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H_ab = hamiltonian(sim_ab)
    psi_ab = initialize_mps(H_ab.site.group, H_ab.site.space, sim_ab.T,
                            bond_dim=5, seed=3)
    res_ab = vumps(psi_ab, H_ab, tol=1e-7, maxiter=60)
    assert abs(res.energy - res_ab.energy) < 5e-3


@pytest.mark.slow
def test_su2_excitations_insulator_exact():
    """P=2 band insulator: the SU(2) quasiparticle ansatz is exact
    (hole dispersion 2t cos k - u), pinning the channel-leg diagram set."""
    from hubbardtn_tpu.algorithms.excitations import excitations
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(4.0,), P=2, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3,
                         seed=1, cells=2)
    res = vumps(psi, H, tol=1e-10, maxiter=60)
    assert abs(res.energy - 4.0) < 1e-9
    ks = np.linspace(0, np.pi, 3)
    Es, _ = excitations(res.psi, H, res.envs, ks, sector=(1, 1, -1),
                        num=1, tol=1e-8)
    np.testing.assert_allclose(np.real(Es).ravel(), 2 * np.cos(ks) - 4.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.imag(Es).ravel(), 0.0, atol=1e-8)


GOLDEN_DISPERSION_U5 = [-0.17257389, -0.2673373, -0.5489149, -1.04588404,
                        -1.425526126]


@pytest.mark.slow
def test_su2_dispersion_u5_variational_dominance():
    """Reference test/OB.jl:76-86 through the GENUINE SU(2) backend.

    The tangent space is now exactly the reference's SU(2)-restricted
    ansatz, so this is an apples-to-apples comparison: at bond_dim=7
    multiplets our variational energies sit at or below every golden value
    (the reference numbers are under-converged at small k), the band edge
    agrees to ~1e-2, imaginary parts vanish, and everything respects the
    exact Bethe-ansatz bound at k=pi."""
    from hubbardtn_tpu.algorithms.excitations import excitations
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(5.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=7,
                         seed=1)
    res = vumps(psi, H, tol=1e-9, maxiter=300)
    assert abs(res.energy - (-0.4858)) < 1e-3
    ks = np.linspace(0, np.pi, 5)
    Es, _ = excitations(res.psi, H, res.envs, ks, sector=(1, 1, -1),
                        num=1, tol=1e-5)
    E = np.real(Es).ravel()
    golden = np.asarray(GOLDEN_DISPERSION_U5)
    np.testing.assert_allclose(np.imag(Es).ravel(), 0.0, atol=1e-8)
    assert np.all(E <= golden + 2e-3)          # variational dominance
    assert abs(E[-1] - golden[-1]) < 1.5e-2    # band edge agreement
    assert E[-1] >= -1.4721 - 1e-3             # exact Bethe-ansatz bound


def _conv_kron(P_ab_idx, su_perm, n):
    P_ab = np.zeros((4, 4))
    for new, old in enumerate(P_ab_idx):
        P_ab[new, old] = 1.0
    P_su = np.zeros((4, 4))
    for new, old in enumerate(su_perm):
        P_su[new, old] = 1.0
    Pc = P_su @ P_ab.T
    K = np.eye(1)
    for _ in range(n):
        K = np.kron(K, Pc)
    return K


def test_su2_mpo_window_grand_canonical():
    """OBC fixed-mu SU(2) MPO == abelian MPO (2-dim trivial sector)."""
    from hubbardtn_tpu.models.hubbard import OBCSim
    from hubbardtn_tpu.ops.sites import grand_site
    from hubbardtn_tpu.ops.sites_su2 import grand_su2_site

    H_ab = hamiltonian(OBCSim(t=(2.726,), u=(7.658,), mu=3.535))
    H_su = hamiltonian(OBCSim(t=(2.726,), u=(7.658,), mu=3.535, su2=True))
    su_site = grand_su2_site()
    K = _conv_kron(_fixed_basis_indices(grand_site()), su_site.perm, 3)
    Wab = np.real(np.asarray(H_ab.to_dense_window(3)))
    np.testing.assert_allclose(K @ Wab @ K.T, su2_dense_window(H_su, 3),
                               atol=1e-10)


def test_su2_mpo_window_multiband():
    """2-band MB model with interband hopping/V/J: SU(2) MPO == abelian."""
    from hubbardtn_tpu.models.hubbard import MBSim

    t = np.array([[0.0, 0.3, 1.0, 0.2], [0.3, 0.5, 0.2, 0.8]])
    u = np.array([[4.0, 1.0, 0.5, 0.2], [1.0, 3.0, 0.2, 0.4]])
    J = np.array([[0.0, 0.3, 0.1, 0.05], [0.3, 0.0, 0.05, 0.1]])
    H_ab = hamiltonian(MBSim(t=t, u=u, J=J, P=2, Q=1))
    H_su = hamiltonian(MBSim(t=t, u=u, J=J, P=2, Q=1, su2=True))
    su_site = canonical_su2_site(2, 1)
    K = _conv_kron(_fixed_basis_indices(canonical_site(2, 1)), su_site.perm, 4)
    Wab = np.real(np.asarray(H_ab.to_dense_window(4)))
    np.testing.assert_allclose(K @ Wab @ K.T, su2_dense_window(H_su, 4),
                               atol=1e-9)


@pytest.mark.slow
def test_su2_driver_composition_idmrg2():
    """The composite driver's IDMRG2 stage (unit cells > 1, reference
    :1009-1010) through the SU(2) backend with channel-packed two-site
    solves: the P=4/Q=2 full-band insulator reaches the exact E = u."""
    from hubbardtn_tpu.algorithms.groundstate import find_groundstate
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(4.0,), P=4, Q=2, su2=True, bond_dim=3)
    H = hamiltonian(sim)
    assert sim.T == 2
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3,
                         seed=1)
    res = find_groundstate(psi, H, svalue=1.5, tol=1e-8, max_rounds=1,
                           final_iters=40, grassmann_iters=0,
                           algorithm="auto")  # auto -> idmrg2 for T=2
    assert abs(res.energy - 4.0) < 1e-7
