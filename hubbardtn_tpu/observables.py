"""Observables on uniform MPS ground states.

TPU-native equivalent of the reference's tools section
(/root/reference/src/HubbardFunctions.jl:1394-1542): per-site bond dimensions
(``dim_state``), electron densities (``density_state``), spin-resolved
densities (``density_spin``) and staggered magnetization (``calc_ms``).

The multi-band chain is band-major: chain position = site*B + band, matching
the reference's ``InfiniteStrip(B, T*B)`` ordering (:491).
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

from .mps.imps import UniformMPS, expectation_local
from .ops.sites import Site


def dim_state(psi: UniformMPS) -> List[int]:
    """Total bond dimension at each bond (reference dim_state, :1399-1405).
    For the SU(2) backend this is the dense (qdim-weighted) dimension,
    matching TensorKit's dim(V)."""
    if getattr(psi.group, "has_su2", False):
        return [psi.bond_space(x).dense_dim for x in range(psi.T)]
    return psi.bond_dims()


def density_state(psi: UniformMPS, site: Site, bands: int = 1) -> np.ndarray:
    """<n> per unit-cell site (rows) and band (columns); squeezed to a vector
    for one band.  Reference density_state (:1495-1523)."""
    n_op = site.op("n")
    T = psi.T
    vals = np.array([float(np.real(expectation_local(psi, x, n_op)))
                     for x in range(T)])
    out = vals.reshape(T // bands, bands)
    return out[:, 0] if bands == 1 else out


def density_spin(psi: UniformMPS, site: Site, bands: int = 1):
    """(n_up, n_down) per unit-cell site/band (reference :1412-1454)."""
    T = psi.T
    up = np.array([float(np.real(expectation_local(psi, x, site.op("nup"))))
                   for x in range(T)])
    dn = np.array([float(np.real(expectation_local(psi, x, site.op("ndn"))))
                   for x in range(T)])
    if bands > 1:
        up = up.reshape(T // bands, bands)
        dn = dn.reshape(T // bands, bands)
    return up, dn


def calc_ms(psi: UniformMPS, site: Site, bands: int = 1) -> float:
    """Staggered magnetization m_s = |sum_i (-1)^i (n_up - n_dn)_i| / N_sites
    (reference calc_ms, :1461-1468)."""
    import warnings
    up, dn = density_spin(psi, site, bands=1)
    sz = 0.5 * (up - dn)
    mag = up - dn
    if mag.size and not np.allclose(np.abs(mag), abs(mag.flat[0]),
                                    rtol=1e-6, atol=1e-12):
        warnings.warn("Spin-density wave?")  # reference :1464-1466
    signs = np.array([(-1.0) ** i for i in range(len(sz))])
    return float(abs(np.sum(signs * sz)) / len(sz))


def filling_check(psi: UniformMPS, site: Site, P: int, Q: int,
                  bands: int = 1) -> float:
    """Deviation of the mean filling from P/Q (reference conservation check,
    :1519-1520)."""
    dens = density_state(psi, site, bands)
    return float(abs(np.mean(dens) - P / Q))
