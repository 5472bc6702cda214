"""Hubbard model definitions and Hamiltonian assembly.

TPU-native equivalent of the reference's simulation structs and one-band
Hamiltonian builder (/root/reference/src/HubbardFunctions.jl:56-238 structs,
:386-472 one-band ``hamiltonian``).  Parameters are frozen dataclasses; the
Hamiltonian is compiled to a channel-sparse FSM MPO through the
Jordan-Wigner term compiler (all fermionic signs resolved at compile time).

Model conventions (matching the reference):

* ``t[r-1]``: hopping at distance r, applied as ``-t`` x (c†c + h.c.)
* ``u[0]``: on-site Coulomb U (doubly-occupied penalty, U n_up n_dn)
* ``u[r]`` (r>=1): density-density n_i n_{i+r}
* ``J[r-1]``: exchange at distance r (spin exchange + pair hopping)
* ``U13[r-1]``: correlated hopping W_abbb at distance r
* unit cell T = Q if P even else 2Q (:408-412)
* ``period`` L: helix wrap, extra -t[0] hopping at distance L (:464-466)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..mpo import terms as tm
from ..mpo.fsm import MPOHamiltonian, mpo_from_terms
from ..ops.fermions import Term
from ..ops.sites import Site, canonical_site, grand_site


@dataclass(frozen=True)
class Simulation:
    """Base class mirroring the reference's ``Simulation`` abstract type."""

    def name(self) -> str:
        return type(self).__name__.replace("Sim", "")


def unit_cell(P: int, Q: int) -> int:
    """T = Q for even P else 2Q (reference :408-412)."""
    return Q if P % 2 == 0 else 2 * Q


@dataclass(frozen=True)
class OBSim(Simulation):
    """One-band fixed-filling Hubbard model (reference OB_Sim, :76-94)."""

    t: Tuple[float, ...]
    u: Tuple[float, ...]
    mu: float = 0.0
    J: Tuple[float, ...] = ()
    P: int = 1
    Q: int = 1
    svalue: float = 2.0
    bond_dim: int = 50
    period: int = 0
    spin: bool = False
    U13: Tuple[float, ...] = ()
    JMs: Tuple[float, float] = (0.0, 0.0)

    def __post_init__(self):
        object.__setattr__(self, "t", tuple(float(x) for x in self.t))
        object.__setattr__(self, "u", tuple(float(x) for x in self.u))
        object.__setattr__(self, "J", tuple(float(x) for x in self.J))
        object.__setattr__(self, "U13", tuple(float(x) for x in self.U13))

    @property
    def T(self) -> int:
        return unit_cell(self.P, self.Q)

    def site(self) -> Site:
        return canonical_site(self.P, self.Q)

    def name(self) -> str:
        return "OB"


def one_band_terms(sim: OBSim) -> List[Term]:
    """Term list for the one-band Hamiltonian (reference :386-472)."""
    T = sim.T
    out: List[Term] = []
    for i in range(T):
        if sim.u:
            out += tm.double_occupancy(i, sim.u[0])
        if sim.mu != 0.0:
            out += tm.number(i, -sim.mu)
        if sim.period == 0:
            for r, tr in enumerate(sim.t, start=1):
                out += tm.hopping(i, i + r, -tr)
            for r, ur in enumerate(sim.u[1:], start=1):
                out += tm.density_density(i, i + r, ur)
            for r, Jr in enumerate(sim.J, start=1):
                if Jr != 0.0:
                    out += tm.exchange(i, i + r, Jr)
            for r, Xr in enumerate(sim.U13, start=1):
                if Xr != 0.0:
                    out += tm.correlated_hopping(i, i + r, Xr)
            J_inter, Ms = sim.JMs
            if Ms != 0.0 and sim.spin:
                # staggered field (-1)^i, reference :459-463 (1-based i there)
                out += tm.szop(i, J_inter * Ms * (-1) ** (i + 1))
        else:
            if len(sim.t) != 1 or len(sim.u) != 1:
                raise NotImplementedError("Extended models in 2D not implemented.")
            out += tm.hopping(i, i + 1, -sim.t[0])
            out += tm.hopping(i, i + sim.period, -sim.t[0])
    return out


def hamiltonian(sim) -> MPOHamiltonian:
    """Compile a simulation's Hamiltonian to an FSM MPO."""
    if isinstance(sim, OBSim):
        return mpo_from_terms(sim.site(), sim.T, one_band_terms(sim))
    raise TypeError(f"unsupported simulation type {type(sim)!r}")
