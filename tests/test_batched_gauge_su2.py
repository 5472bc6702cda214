"""Bucketed SU(2) Newton-Schulz polar gauge vs the exact QR-based gauge."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_gauge_su2 import (PolarGaugePlanSU2,
                                                        gauge_site_polar_su2)
from hubbardtn_tpu.algorithms.vumps import _gauge_site, vumps
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import bond_identity, initialize_mps
from hubbardtn_tpu.solvers.krylov import full_blocks
from hubbardtn_tpu.tensor.symtensor import tensordot


@pytest.fixture(scope="module")
def gauge_point():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=8,
                         seed=3)
    return vumps(psi, H, tol=1e-8, maxiter=6).psi


@pytest.mark.heavy
def test_su2_polar_gauge_matches_qr(gauge_point):
    psi = gauge_point
    for x in range(psi.T):
        AC = full_blocks(psi.AC(x))
        Cl = full_blocks(psi.Cs[(x - 1) % psi.T])
        Cr = full_blocks(psi.Cs[x])
        ALq, ARq, dlq, drq = _gauge_site(AC, Cl, Cr)
        plan = PolarGaugePlanSU2(AC, Cl, Cr, iters=40)
        ALp, ARp, dlp, drp = gauge_site_polar_su2(AC, Cl, Cr, plan=plan)
        # same ballpark of gauge error as the exact QR route
        assert float(dlp) < 2 * float(dlq) + 1e-8
        assert float(drp) < 2 * float(drq) + 1e-8
        # dense isometry conditions on the recovered factors
        gl = tensordot(ALp.conj(), ALp, axes=([0, 1], [0, 1]))
        I = bond_identity(ALp.group, ALp.spaces[2], dtype=ALp.dtype)
        assert float((gl - I).norm()) < 1e-7
        gr = tensordot(ARp, ARp.conj(), axes=([1, 2], [1, 2]))
        Il = bond_identity(ARp.group, ARp.spaces[0], dtype=ARp.dtype)
        assert float((gr - Il).norm()) < 1e-7
