"""End-to-end ground-state tests against the reference's golden energies.

Mirrors /root/reference/test/OB.jl:21-31 ("Dependence on parameters"):
one-band Hubbard at half filling, E(u) for u = 0, 1, 2 with atol 1e-2.
The u=0 case doubles as a free-fermion analytic check (E = -4/pi in the
infinite-chi limit)."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps

GOLDEN_OB = {0.0: -1.2696767, 1.0: -1.037173, 2.0: -0.84163698}


@pytest.mark.slow
def test_one_band_free_fermions():
    """Fixed-space VUMPS at small bond dimension reaches the golden value."""
    sim = OBSim(t=(1.0,), u=(0.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=6, seed=1)
    res = vumps(psi, H, tol=1e-5, maxiter=60)
    assert abs(res.energy - GOLDEN_OB[0.0]) < 1e-2
    assert abs(res.energy - (-4 / np.pi)) < 5e-3


@pytest.mark.heavy
def test_driver_composition_idmrg2_grassmann():
    """The composite driver follows the reference recipe (:1009-1027):
    IDMRG2 for unit cells > 1, then the VUMPS & GradientGrassmann polish.
    On the P=4/Q=2 full-band insulator (exact product state, E = u/site)
    every stage must preserve/reach the exact energy quickly."""
    sim = OBSim(t=(1.0,), u=(4.0,), P=4, Q=2, bond_dim=3)
    H = hamiltonian(sim)
    assert sim.T == 2
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3, seed=1)
    from hubbardtn_tpu.algorithms.groundstate import find_groundstate
    res = find_groundstate(psi, H, svalue=1.5, tol=1e-8, max_rounds=1,
                           final_iters=40, grassmann_iters=3,
                           algorithm="auto")  # auto -> idmrg2 for T=2
    assert abs(res.energy - 4.0) < 1e-7


GOLDEN_FILLING = {(1, 2): -0.73920032, (1, 1): -0.48460447, (3, 2): 1.76073968}


@pytest.mark.slow
@pytest.mark.parametrize("PQ", [(1, 2), (1, 1), (3, 2)])
def test_one_band_filling_sweep(PQ):
    """Reference test/OB.jl:40-54: u=5 at fillings 1/2, 1, 3/2 (atol 1e-2)."""
    P, Q = PQ
    sim = OBSim(t=(1.0,), u=(5.0,), P=P, Q=Q, bond_dim=5)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=5, seed=1)
    res = vumps(psi, H, tol=1e-5, maxiter=80)
    assert abs(res.energy - GOLDEN_FILLING[PQ]) < 1e-2
    from hubbardtn_tpu.observables import filling_check
    # filling is symmetry-exact only at full convergence; this fixed-budget
    # solve leaves a gauge error ~1e-4, so allow the matching O(1e-6) drift
    assert filling_check(res.psi, H.site, P, Q) < 5e-6


@pytest.mark.slow
@pytest.mark.parametrize("u", [0.0, 1.0, 2.0])
def test_one_band_golden(u):
    """Full driver (reference compute_groundstate analog, svalue=2.0)."""
    sim = OBSim(t=(1.0,), u=(u,), P=1, Q=1, svalue=2.0, bond_dim=6)
    out = compute_groundstate(sim, tol=1e-5, max_rounds=2, round_iters=25,
                              final_iters=60)
    assert abs(out["energy"] - GOLDEN_OB[u]) < 1e-2
