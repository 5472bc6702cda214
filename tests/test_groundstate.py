"""End-to-end ground-state tests against the reference's golden energies.

Mirrors /root/reference/test/OB.jl:21-31 ("Dependence on parameters"):
one-band Hubbard at half filling, E(u) for u = 0, 1, 2 with atol 1e-2.
The u=0 case doubles as a free-fermion analytic check (E = -4/pi in the
infinite-chi limit)."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps

GOLDEN_OB = {0.0: -1.2696767, 1.0: -1.037173, 2.0: -0.84163698}


def solve_ob(u: float, bond_dim: int = 6, tol: float = 1e-5, maxiter: int = 60):
    sim = OBSim(t=(1.0,), u=(u,), P=1, Q=1, bond_dim=bond_dim)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=bond_dim,
                         seed=1)
    return vumps(psi, H, tol=tol, maxiter=maxiter)


def test_one_band_free_fermions():
    res = solve_ob(0.0)
    # golden regression value (chi-limited) and analytic value
    assert abs(res.energy - GOLDEN_OB[0.0]) < 1e-2
    assert abs(res.energy - (-4 / np.pi)) < 5e-3


@pytest.mark.slow
@pytest.mark.parametrize("u", [1.0, 2.0])
def test_one_band_interacting(u):
    res = solve_ob(u)
    assert abs(res.energy - GOLDEN_OB[u]) < 1e-2
