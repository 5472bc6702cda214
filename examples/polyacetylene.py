"""Two-band ab-initio polyacetylene model.

Python counterpart of the reference example
/root/reference/examples/polyacetylene.jl: a 2-band Hubbard model with the
on-site + inter-site hopping/direct/exchange matrices obtained from
downfolded ab-initio calculations.

Run:  python examples/polyacetylene.py
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

s = 2.5
P, Q = 1, 1
bond_dim = 6

# B x (B*(range+1)) matrices: on-site block first, then per-distance blocks
t = np.array([[0.000, 3.803, -0.548, 0.000],
              [3.803, 0.000, 2.977, -0.501]])
U = np.array([[10.317, 6.264, 0.000, 0.000],
              [6.264, 10.317, 6.162, 0.000]])
J = np.array([[0.000, 0.123, 0.000, 0.000],
              [0.123, 0.000, 0.113, 0.000]])

model = ht.MBSim(t=t, u=U, J=J, P=P, Q=Q, svalue=s, bond_dim=bond_dim,
                 code="polyacetylene")

out = ht.produce_groundstate(model, round_iters=25, final_iters=60, tol=1e-5,
                             max_rounds=2)
psi, H = out["groundstate"], out["ham"]
print("Groundstate energy per site:", out["energy"])
print("Bond dimensions:", ht.dim_state(psi))
print("Electron density per band:", ht.density_state(psi, H.site, bands=2))

momenta = np.linspace(0, np.pi, 3)
exc = ht.produce_excitations(model, momenta, nums=1, charges=[0, 0.0, 0],
                             round_iters=25, final_iters=60, tol=1e-5,
                             max_rounds=2)
print("Neutral excitation energies:", np.real(exc["Es"]).ravel())
