"""Golden regression parity with the reference test suite.

Counterparts of the reference checks that round 1 left untested:

* ``test/MBC.jl:44-60`` — 2-band grand-canonical E + sum(mu*n);
* ``test/MBC.jl:67-75`` — MBC excitations real;
* ``test/Spin.jl:49-54`` — 2-band spin-resolved golden energy;
* ``test/Spin.jl:61-69`` — neutral-sector spin excitation real;
* ``test/Spin.jl:76-86`` — density consistency sum(n) = sum(n_up + n_dn);
* ``test/MB.jl:79-87``  — MB excitations real.

All slow: full physics pipelines at small bond dimension, loose reference
tolerances (1e-1 as in the reference suite).
"""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.excitations import excitations
from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
from hubbardtn_tpu.models.hubbard import MBCSim, MBSim, OBSim
from hubbardtn_tpu.observables import density_spin, density_state, dim_state


def _mbc_sim(bond_dim=6):
    """test/MBC.jl model: t_OS=diag(0.5), t_IS=I, U=I, V=0, J=0."""
    t = np.hstack([0.5 * np.eye(2), np.eye(2)])
    u = np.hstack([np.eye(2), np.zeros((2, 2))])
    return MBCSim(t=t, u=u, J=np.zeros((2, 2)), bond_dim=bond_dim)


@pytest.mark.slow
def test_mbc_golden_energy():
    """Reference test/MBC.jl:44-60: E + sum(mu_i n_i) ~ -1.01631556/site
    (atol 1e-1).  mu_i is the on-site t diagonal, re-added because the MPO
    absorbs it as a chemical potential."""
    sim = _mbc_sim()
    out = compute_groundstate(sim, tol=1e-6, max_rounds=2, round_iters=30,
                              final_iters=80, algorithm="vumps",
                              grassmann_iters=5)
    psi, H = out["groundstate"], out["ham"]
    mu = np.array([0.5, 0.5])
    Ne = density_state(psi, H.site, bands=2).ravel()
    E = out["energy"] + float(np.sum(mu * Ne)) / psi.T
    assert abs(E - (-1.01631556)) < 1e-1


@pytest.mark.slow
def test_mbc_excitations_real():
    """Reference test/MBC.jl:67-75: excitation energies have Im ~ 0."""
    sim = _mbc_sim()
    out = compute_groundstate(sim, tol=1e-6, max_rounds=2, round_iters=30,
                              final_iters=80, algorithm="vumps",
                              grassmann_iters=0)
    ks = np.linspace(0, np.pi, 3)
    Es, _ = excitations(out["groundstate"], out["ham"], out["environments"],
                        ks, sector=(1, 1), num=1, tol=1e-6)
    np.testing.assert_allclose(np.imag(Es).ravel(), 0.0, atol=1e-8)
    D = dim_state(out["groundstate"])
    assert all(isinstance(d, int) and d > 0 for d in D)  # Tools parity


@pytest.mark.slow
def test_spin_golden_two_band(monkeypatch):
    """Reference test/Spin.jl:49-54: 2-band spin model E ~ -0.63093
    (two decoupled u=3 chains in the U(1)xU(1) basis, atol 1e-1).

    Staged driver only: the fused whole-iteration program on XLA CPU for
    this T*B=4 spin model trips the image's documented glibc
    heap-corruption bug (CLAUDE.md "Hard-won environment bug" — crash
    site wanders between runs; reproduced unchanged at the round-3
    commit).  The fused/staged equality itself is pinned elsewhere
    (tests/test_fused_vumps.py); this golden's job is the energy."""
    monkeypatch.setenv("HTN_NO_FUSED", "1")
    t = np.hstack([np.zeros((2, 2)), np.eye(2)])
    u = np.hstack([3.0 * np.eye(2), np.zeros((2, 2))])
    sim = MBSim(t=t, u=u, J=np.zeros((2, 2)), P=1, Q=1, bond_dim=4, spin=True)
    out = compute_groundstate(sim, tol=1e-5, max_rounds=1, round_iters=30,
                              final_iters=50, algorithm="vumps",
                              grassmann_iters=5)
    assert abs(out["energy"] - (-0.63093)) < 1e-1


@pytest.mark.slow
def test_spin_neutral_excitation_real_and_density_consistency(monkeypatch):
    """Reference test/Spin.jl:61-69 (neutral-sector excitation, Im ~ 0) and
    :76-86 (sum n = sum n_up + n_dn).  Staged driver (see
    test_spin_golden_two_band: XLA CPU heap bug on fused spin programs)."""
    monkeypatch.setenv("HTN_NO_FUSED", "1")
    sim = OBSim(t=(1.0,), u=(8.0,), P=1, Q=1, bond_dim=6, spin=True)
    out = compute_groundstate(sim, tol=1e-6, max_rounds=1, round_iters=40,
                              final_iters=80, algorithm="vumps",
                              grassmann_iters=0)
    psi, H = out["groundstate"], out["ham"]
    ks = np.linspace(0, np.pi, 3)
    Es, _ = excitations(psi, H, out["environments"], ks, sector=(0, 0, 0),
                        num=1, tol=1e-6)
    np.testing.assert_allclose(np.imag(Es).ravel(), 0.0, atol=1e-8)
    n = density_state(psi, H.site)
    nup, ndn = density_spin(psi, H.site)
    assert abs(float(np.sum(n)) - float(np.sum(nup + ndn))) < 1e-8


@pytest.mark.slow
def test_mb_excitations_real():
    """Reference test/MB.jl:79-87: 2-band excitation energies real."""
    t = np.hstack([np.zeros((2, 2)), np.eye(2)])
    u = np.hstack([3.0 * np.eye(2), np.zeros((2, 2))])
    sim = MBSim(t=t, u=u, J=np.zeros((2, 2)), P=1, Q=1, bond_dim=4)
    out = compute_groundstate(sim, tol=1e-5, max_rounds=1, round_iters=30,
                              final_iters=50, algorithm="vumps",
                              grassmann_iters=0)
    ks = np.linspace(0, np.pi, 3)
    Es, _ = excitations(out["groundstate"], out["ham"], out["environments"],
                        ks, sector=(1, 1, 1), num=1, tol=1e-6)
    np.testing.assert_allclose(np.imag(Es).ravel(), 0.0, atol=1e-8)
