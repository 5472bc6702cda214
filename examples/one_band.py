"""One-band Hubbard chain: ground state, excitations, observables.

Python counterpart of the reference example
/root/reference/examples/One_band.jl.

Run:  python examples/one_band.py
"""

import os

import jax

# run on CPU unless explicitly overridden (HUBBARDTN_PLATFORM=tpu ...)
jax.config.update("jax_platforms", os.environ.get("HUBBARDTN_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import hubbardtn_tpu as ht

# ----------------------------------------------------------------------
# define the system
# ----------------------------------------------------------------------
s = 2.5            # Schmidt cut value, determines the bond dimension
P, Q = 1, 1        # filling P/Q; 1/1 is half filling
bond_dim = 8       # initial bond dimension (adapted by the solver)

t = [1.0, 0.1]     # nearest and next-nearest hopping
u = [8.0]          # on-site Coulomb repulsion
mu = 0.0

model = ht.OBSim(t=t, u=u, mu=mu, P=P, Q=Q, svalue=s, bond_dim=bond_dim)

# ----------------------------------------------------------------------
# ground state (cached under ./data/sims/OB/)
# ----------------------------------------------------------------------
out = ht.produce_groundstate(model, round_iters=30, final_iters=80, tol=1e-6)
psi, H = out["groundstate"], out["ham"]
print("Groundstate energy:", out["energy"])
print("Bond dimensions:", ht.dim_state(psi))
print("Electron density:", ht.density_state(psi, H.site))

# ----------------------------------------------------------------------
# hole excitations (charges = [fermion parity, spin, charge])
# ----------------------------------------------------------------------
momenta = np.linspace(0, np.pi, 5)
exc = ht.produce_excitations(model, momenta, nums=1, charges=[1, 0.5, -1],
                             round_iters=30, final_iters=80, tol=1e-6)
print("Excitation energies:", np.real(exc["Es"]).ravel())

ax = ht.plot_excitations(momenta, exc["Es"], title="One-band hole dispersion")
ax.figure.savefig("one_band_dispersion.png", dpi=120)
print("Wrote one_band_dispersion.png")
