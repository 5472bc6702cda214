"""IDMRG2 vs VUMPS-expansion bond-distribution parity.

The two ground-state compositions (reference :1009-1010 IDMRG2 for T>1;
:1011-1023 VUMPS+VUMPSSvdCut expansion) must converge to the same
Schmidt-weight structure on the same model — a silently under-resolved
sector in either adaptation path would slip through the loose golden
energies (1e-1/1e-2) but not through this comparison.  Weight profiles
are compared as sorted multisets per bond: virtual U(1) charges carry a
per-path offset gauge freedom, so sector LABELS are not comparable
across paths but the weight spectrum is.
"""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
from hubbardtn_tpu.models.hubbard import OBSim


@pytest.mark.slow
def test_idmrg2_vumps_bond_distribution_parity(monkeypatch):
    monkeypatch.setenv("HTN_NO_FUSED", "1")  # small problem: skip the
    # fused program's multi-minute XLA CPU compiles
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, bond_dim=8, svalue=4.0)
    outs = {}
    for alg in ("idmrg2", "vumps"):
        outs[alg] = compute_groundstate(
            sim, tol=1e-6, max_rounds=4, round_iters=25, final_iters=60,
            algorithm=alg, grassmann_iters=0, max_bond=24)
    from hubbardtn_tpu.models.exact import lieb_wu_energy
    exact = lieb_wu_energy(2.0)
    eA = outs["idmrg2"]["energy"]
    eB = outs["vumps"]["energy"]
    # both adaptation paths land in the same accuracy class near the
    # exact Lieb-Wu energy (the pre-round-4 under-resolution bug left
    # idmrg2 at 1.9e-2 above exact with bonds [8, 10] — both gates below
    # catch it)
    assert abs(eA - exact) < 8e-3, (eA, exact)
    assert abs(eB - exact) < 8e-3, (eB, exact)
    assert abs(eA - eB) < 6e-3, (eA, eB)

    for alg in outs:
        psi = outs[alg]["groundstate"]
        # neither path may leave the bond dimension under-resolved: the
        # cutoff/cap schedule saturates both near the 24-per-bond cap
        assert min(psi.bond_dims()) >= 16, (alg, psi.bond_dims())

    profs = {}
    for alg, out in outs.items():
        psi = out["groundstate"]
        profs[alg] = []
        for x in range(psi.T):
            spec = psi.entanglement_spectrum(x)
            w = sorted((float(np.sum(np.asarray(s) ** 2))
                        for s in spec.values() if len(s)), reverse=True)
            profs[alg].append(w)
    for x in range(len(profs["idmrg2"])):
        a, b = profs["idmrg2"][x], profs["vumps"][x]
        # dominant-sector mass agrees between the paths (sorted weight
        # profiles are label-free: virtual U(1) charges carry a per-path
        # offset gauge).  A pulverized or collapsed sector split shifts
        # tens of percent of Schmidt weight between the top sectors.
        top4 = abs(sum(a[:4]) - sum(b[:4]))
        assert top4 < 0.25, (x, top4, a[:6], b[:6])
        assert a[0] < 0.9 and b[0] < 0.9, (x, a[0], b[0])
