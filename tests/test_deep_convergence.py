"""Deep-convergence ladder toward the 1e-8-relative north star.

Unlike the toy-bond goldens, these push the FULL driver (multi-round
expansion, Schmidt-cutoff truncation, recompiles at every structure
change, Grassmann polish) to chi of a few hundred and assert 1e-6
RELATIVE agreement with exact Bethe-ansatz energies:

* u=0 free fermions: E = -4/pi;
* u=2: E = -4 int_0^inf J0(x) J1(x) / (x (1 + exp(x u / 2))) dx.

Marked ``deep`` (excluded by default via pytest.ini addopts): one test is
roughly an hour of CPU wall-clock, dominated by XLA recompiles after bond
expansions.  Run with ``pytest -m deep``.
"""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
from hubbardtn_tpu.models.hubbard import OBSim


def bethe_energy(u: float) -> float:
    """Ground-state energy/site of the half-filled Hubbard chain
    (Lieb-Wu)."""
    if u == 0.0:
        return -4.0 / np.pi
    from scipy.integrate import quad
    from scipy.special import j0, j1

    def f(x):
        return j0(x) * j1(x) / (x * (1.0 + np.exp(0.5 * x * u)))

    val, _err = quad(f, 0.0, np.inf, limit=400)
    return -4.0 * val


def test_bethe_reference_values():
    """Fast sanity: the reference's golden test energies
    (test/OB.jl:21-31, finite-chi DMRG) sit ~3e-3 ABOVE the exact Bethe
    values — variationally consistent."""
    for u, golden in ((0.0, -1.2696767), (1.0, -1.037173),
                      (2.0, -0.84163698)):
        exact = bethe_energy(u)
        assert 0 < golden - exact < 4e-3, (u, golden, exact)


@pytest.mark.deep
@pytest.mark.slow  # double-marked: "-m 'not slow'" overrides the ini addopts
@pytest.mark.parametrize("u", [0.0, 2.0])
def test_deep_convergence_golden(u):
    exact = bethe_energy(u)
    sim = OBSim(t=(1.0,), u=(u,), P=1, Q=1, svalue=4.5, bond_dim=16)
    out = compute_groundstate(sim, tol=1e-9, max_rounds=10, round_iters=60,
                              final_iters=400, algorithm="vumps",
                              grassmann_iters=50, verbosity=1)
    rel = abs(out["energy"] - exact) / abs(exact)
    print(f"u={u}: E={out['energy']:.10f} exact={exact:.10f} rel={rel:.2e} "
          f"bonds={out['groundstate'].bond_dims()}")
    assert rel < 1e-6
