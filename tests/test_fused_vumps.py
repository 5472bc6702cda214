"""Fused whole-iteration VUMPS vs the staged driver.

The fused program (algorithms/fused_vumps.py) must be an exact re-trace of
the staged iteration's stages (same kernels, same tolerance semantics),
so both drivers run here on the same model from the same seed and must
agree on the converged energy to solver tolerance.  Reference behavior:
one iteration of MPSKit's VUMPS loop
(/root/reference/src/HubbardFunctions.jl:1012,1017,1025)."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps


def _run(monkeypatch, fused: bool, PQ=(2, 1), u: float = 1.0,
         bond_dim: int = 6, tol: float = 1e-6):
    monkeypatch.setenv("HTN_NO_FUSED", "" if fused else "1")
    sim = OBSim(t=(1.0,), u=(u,), P=PQ[0], Q=PQ[1])
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T,
                         bond_dim=bond_dim, seed=3)
    return vumps(psi, H, tol=tol, maxiter=80)


def test_fused_path_is_taken(monkeypatch):
    res = _run(monkeypatch, fused=True)
    assert res.converged
    assert all("fused" in h["stage_ms"] for h in res.history)


@pytest.mark.heavy
def test_fused_matches_staged_full_band(monkeypatch):
    # P/Q = 2: the exactly-solvable full-band insulator on a T=1 cell;
    # random bond_dim-6 init still exercises every fused stage
    rf = _run(monkeypatch, fused=True)
    rs = _run(monkeypatch, fused=False)
    assert rs.converged and rf.converged
    assert all("fused" not in h["stage_ms"] for h in rs.history)
    # both optimize the same functional to tol 1e-6; energies agree to the
    # variational error scale (err^2), far below the golden atol
    assert abs(rf.energy - rs.energy) < 1e-8
    assert rf.error < 1e-6 and rs.error < 1e-6


@pytest.mark.slow
def test_fused_matches_staged_T2(monkeypatch):
    # gapped (Mott) point: converges well inside the iteration budget
    rf = _run(monkeypatch, fused=True, PQ=(1, 1), u=6.0, bond_dim=5,
              tol=1e-5)
    rs = _run(monkeypatch, fused=False, PQ=(1, 1), u=6.0, bond_dim=5,
              tol=1e-5)
    assert rs.converged and rf.converged
    # two independent optimizations to tol 1e-5: energies agree to well
    # under err * scale (observed ~1.5e-7)
    assert abs(rf.energy - rs.energy) < 5e-7


@pytest.mark.slow
def test_fused_free_fermion_energy(monkeypatch):
    """The fused driver reaches the same golden value the staged test pins
    (E -> -4/pi at chi -> inf; atol matches tests/test_groundstate.py)."""
    res = _run(monkeypatch, fused=True, PQ=(1, 1), u=0.0, tol=1e-5)
    assert abs(res.energy - (-4 / np.pi)) < 5e-3


def test_fused_envs_consistent(monkeypatch):
    """The result's rebuilt Environments reproduce the fused loop's final
    energy (the carried warm starts are the converged solutions)."""
    res = _run(monkeypatch, fused=True)
    e_env = float(np.real(res.envs.energy_per_site))
    assert abs(e_env - res.energy) < 1e-9


# ----------------------------------------------------------------------
# SU(2) fusion-tree backend (fused_vumps_su2.py)
# ----------------------------------------------------------------------

def _run_su2(monkeypatch, fused: bool, u: float = 2.0, bond_dim: int = 4,
             tol: float = 1e-6, maxiter: int = 80):
    monkeypatch.setenv("HTN_NO_FUSED", "" if fused else "1")
    sim = OBSim(t=(1.0,), u=(u,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T,
                         bond_dim=bond_dim, seed=3)
    return vumps(psi, H, tol=tol, maxiter=maxiter)


@pytest.mark.slow
def test_fused_su2_path_is_taken(monkeypatch):
    res = _run_su2(monkeypatch, fused=True)
    assert res.converged
    assert all("fused" in h["stage_ms"] for h in res.history)


@pytest.mark.slow
def test_fused_su2_matches_staged(monkeypatch):
    rf = _run_su2(monkeypatch, fused=True)
    rs = _run_su2(monkeypatch, fused=False)
    assert rs.converged and rf.converged
    assert all("fused" not in h["stage_ms"] for h in rs.history)
    # both optimize the same functional to tol 1e-6; energies agree to
    # the variational error scale (err^2)
    assert abs(rf.energy - rs.energy) < 5e-7


@pytest.mark.slow
def test_fused_su2_envs_consistent(monkeypatch):
    res = _run_su2(monkeypatch, fused=True)
    e_env = float(np.real(res.envs.energy_per_site))
    assert abs(e_env - res.energy) < 1e-9
