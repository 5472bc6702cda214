"""Plotting helpers (matplotlib equivalents of the reference's Plots.jl
figures, /root/reference/src/HubbardFunctions.jl:1549-1573)."""

from __future__ import annotations

import numpy as np


def plot_excitations(momenta, Es, title: str = "Excitation energies", ax=None):
    """Dispersion line plot: one blue line per excitation branch."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots()
    Es = np.atleast_2d(np.asarray(Es))
    if Es.shape[0] != len(momenta):
        Es = Es.T
    for i in range(Es.shape[1]):
        ax.plot(momenta, np.real(Es[:, i]), color="tab:blue")
    ax.set_xlabel("k")
    ax.set_ylabel("Energy density")
    ax.set_title(title)
    return ax


def plot_spin(psi, site, bands: int = 1, title: str = "Spin Density", ax=None):
    """Heatmap of S_z = n_up - n_down over the unit cell (site x band)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from .observables import density_spin
    up, dn = density_spin(psi, site, bands)
    Sz = np.atleast_2d(up - dn)
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(Sz.T, cmap="gray", vmin=-1, vmax=1, aspect="auto")
    ax.set_xlabel("Site")
    ax.set_ylabel("Band")
    ax.set_title(title)
    plt.colorbar(im, ax=ax)
    return ax
