"""Riemannian CG polish regression (reference ``GradientGrassmann``,
/root/reference/src/HubbardFunctions.jl:1025-1027 via OptimKit).

Pins the round-4 rework of algorithms/grassmann.py: transported PR+
conjugate gradients with a directional-derivative (approximate-Wolfe)
line search must reach |g| < 1e-8 on the OB u=2 golden in FEWER
iterations than the same machinery without momentum (the steepest-descent
baseline, method="gd"), and both must land on the same energy.
"""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.grassmann import grassmann_polish
from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps


@pytest.mark.slow
def test_grassmann_cg_beats_gd_to_1e8():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=12,
                         seed=1)
    res = vumps(psi, H, tol=1e-5, maxiter=80)
    cg = grassmann_polish(res.psi, H, tol=1e-8, maxiter=60, envs=res.envs,
                          method="cg")
    gd = grassmann_polish(res.psi, H, tol=1e-8, maxiter=60, envs=res.envs,
                          method="gd")
    assert cg.converged and cg.error < 1e-8
    assert gd.error < 1e-7  # the baseline itself must not be broken
    assert cg.iterations < gd.iterations, (cg.iterations, gd.iterations)
    # both descend from the same point onto the same fixed point
    assert abs(cg.energy - gd.energy) < 1e-8
    # the polish must never raise the energy above the input state's
    # f64-consistent value by more than the estimate-bias scale
    assert cg.energy <= res.energy + 1e-5


def test_grassmann_method_validation():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=4,
                         seed=0)
    with pytest.raises(ValueError):
        grassmann_polish(psi, H, maxiter=1, method="nope")
