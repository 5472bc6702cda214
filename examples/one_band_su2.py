"""One-band Hubbard chain with genuine SU(2) spin symmetry.

The reference's default symmetry setting (fZ2 x SU2 x U1,
/root/reference/src/HubbardFunctions.jl:245-255; examples/One_band.jl)
through the fusion-tree backend: pass ``su2=True`` to any model and the
same workflow API applies.  Bond "dimensions" count SU(2) multiplets, so
the dense (qdim-weighted) bond is larger than the numbers suggest.

Run on CPU:  python examples/one_band_su2.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import hubbardtn_tpu as ht


def main():
    model = ht.OBSim(t=[1.0], u=[5.0], P=1, Q=1, su2=True,
                     svalue=2.0, bond_dim=6)

    out = ht.produce_groundstate(model, verbosity=1, max_rounds=2,
                                 round_iters=40, final_iters=120)
    psi, H = out["groundstate"], out["ham"]
    print(f"E/site = {out['energy']:.8f}")
    print("multiplets per bond:", ht.dim_state(psi))
    print("density:", np.real(ht.density_state(psi, H.site)))

    # hole dispersion in the (parity 1, spin 1/2, charge -1) sector —
    # exactly the reference's restricted quasiparticle ansatz
    ks = np.linspace(0, np.pi, 5)
    exc = ht.produce_excitations(model, ks, nums=1, charges=[1, 0.5, -1],
                                 verbosity=1)
    print("hole dispersion:", np.real(exc["Es"]).ravel())


if __name__ == "__main__":
    main()
