"""Exact analytic reference energies for the one-band Hubbard chain.

The Bethe-ansatz ground-state energy of the half-filled 1D Hubbard model
(Lieb & Wu, PRL 20, 1445 (1968)) provides an *exact* external anchor for
the reference's golden values (test/OB.jl:21-31 quotes finite-bond
approximations of exactly these numbers: u=0 -> -4/pi ~ -1.2732, u=2 ->
-0.8416...) and for the driver north star of reproducing energies to 1e-8
relative on a TPU chip (BASELINE.json): a chip-computed energy can be
compared against this integral with no simulation in the loop.
"""

from __future__ import annotations

import numpy as np


def lieb_wu_energy(u: float) -> float:
    """Ground-state energy per site of the half-filled Hubbard chain.

    E(u)/t = -4 \\int_0^inf dw J0(w) J1(w) / (w (1 + exp(w u / 2))),
    with the reference's convention t=1 and on-site repulsion ``u``
    (reference hamiltonian :424,441: ``u[1]`` multiplies the on-site
    double-occupancy operator).  Evaluated to ~1e-12 with an adaptive
    quadrature over exponentially damped panels.

    At u=0 this reduces to -4/pi.
    """
    from scipy.integrate import quad
    from scipy.special import j0, j1

    u = float(u)
    if u < 0:
        raise ValueError("lieb_wu_energy requires u >= 0")
    if u == 0.0:
        return -4.0 / np.pi

    def integrand(w):
        # 1/(1+exp(x)) written stably for large x
        x = 0.5 * u * w
        return j0(w) * j1(w) / w * np.exp(-x) / (1.0 + np.exp(-x))

    # J0*J1/w ~ w/2 at 0 (finite); the Fermi factor kills the tail.
    # Integrate panel-by-panel to keep quad honest about the Bessel
    # oscillations, stopping when panels stop contributing.
    total = 0.0
    a = 0.0
    negligible = 0
    for k in range(1, 400):
        b = 4.0 * k
        val, _err = quad(integrand, a, b, limit=200)
        total += val
        a = b
        # an oscillatory panel can cancel to ~0 while later panels still
        # contribute (slow Fermi tail at small u): stop only after TWO
        # consecutive negligible panels
        negligible = negligible + 1 if abs(val) < 1e-16 else 0
        if negligible >= 2 and k > 4:
            break
    return -4.0 * total
