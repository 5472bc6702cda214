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

import numpy as _np

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
    # True: genuine non-abelian SU(2) spin symmetry (fusion-tree backend),
    # the reference's spin=False setting; False: its U(1)-Sz subgroup.
    su2: bool = False

    def __post_init__(self):
        object.__setattr__(self, "t", tuple(float(x) for x in self.t))
        object.__setattr__(self, "u", tuple(float(x) for x in self.u))
        object.__setattr__(self, "J", tuple(float(x) for x in self.J))
        object.__setattr__(self, "U13", tuple(float(x) for x in self.U13))
        if self.su2 and self.spin:
            raise ValueError("su2=True is the spin-symmetric setting; "
                             "spin=True selects the U(1)xU(1) basis")

    @property
    def T(self) -> int:
        return unit_cell(self.P, self.Q)

    def site(self):
        if self.su2:
            from ..ops.sites_su2 import canonical_su2_site
            return canonical_su2_site(self.P, self.Q)
        return canonical_site(self.P, self.Q)

    def name(self) -> str:
        return "OB"


@dataclass(frozen=True)
class OBCSim(Simulation):
    """One-band grand-canonical Hubbard model (reference OBC_Sim, :152-177):
    the particle number is set by a chemical potential ``mu``, or found
    automatically for a target filling ``f`` (exactly one of the two is set).
    Unit cell T = 1; symmetry fZ2 x U1(2Sz) (no particle-number U(1))."""

    t: Tuple[float, ...]
    u: Tuple[float, ...]
    mu: Optional[float] = None
    f: Optional[float] = None
    svalue: float = 2.0
    bond_dim: int = 50
    period: int = 0
    J: Tuple[float, ...] = ()
    U13: Tuple[float, ...] = ()
    spin: bool = False
    JMs: Tuple[float, float] = (0.0, 0.0)
    # mu-search knobs (reference kwargs, :1047-1053)
    tol_mu: float = 1e-8
    maxiter_mu: int = 20
    step_size: float = 1.0
    lower_mu: float = 0.0
    upper_mu: float = 0.0
    verbosity_mu: int = 0
    su2: bool = False

    def __post_init__(self):
        object.__setattr__(self, "t", tuple(float(x) for x in self.t))
        object.__setattr__(self, "u", tuple(float(x) for x in self.u))
        object.__setattr__(self, "J", tuple(float(x) for x in self.J))
        object.__setattr__(self, "U13", tuple(float(x) for x in self.U13))
        if self.spin:
            raise NotImplementedError("Spin not implemented.")  # :154
        if (self.mu is None) == (self.f is None):
            raise ValueError("set exactly one of mu / f")
        if self.f is not None and not (0 < self.f < 2):
            raise ValueError("Filling should be between 0 and 2.")

    @property
    def T(self) -> int:
        return 1

    def site(self):
        if self.su2:
            from ..ops.sites_su2 import grand_su2_site
            return grand_su2_site()
        return grand_site()

    def with_mu(self, mu: float) -> "OBCSim":
        """The fixed-mu helper used inside the mu search (OBC_Sim2 analog)."""
        kw = {k: getattr(self, k) for k in (
            "t", "u", "svalue", "bond_dim", "period", "J", "U13", "spin",
            "JMs", "tol_mu", "maxiter_mu", "step_size", "lower_mu",
            "upper_mu", "verbosity_mu", "su2")}
        return OBCSim(mu=mu, f=None, **kw)

    def name(self) -> str:
        return "OBC"


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


@dataclass(frozen=True)
class MBSim(Simulation):
    """B-band fixed-filling Hubbard model (reference MB_Sim, :117-135).

    Matrix conventions follow the reference: ``t``/``u``/``J`` are
    B x (B*(range+1)) with the on-site block first, then one block per
    inter-site distance; ``U13`` is the on-site B x B correlated-hopping
    matrix.  The diagonal of the on-site t block is the per-band chemical
    potential; the diagonal of the on-site u block is the on-band Hubbard U.

    Four-index interactions use *chemists' notation*: ``U112``/``U1111`` map
    tuples (i,j,k,l) of 1-based flattened band+distance indices (index m
    means band (m-1)%B at cell-site offset (m-1)//B) to W values entering as
    (1/2) W sum_st c†_is c†_jt c_kt c_ls;  ``U13_IS`` is a (B,B,4) array per
    distance with the reference's orientation order (:708-711).
    """

    t: tuple
    u: tuple
    J: tuple
    U13: tuple = ()
    P: int = 1
    Q: int = 1
    svalue: float = 2.0
    bond_dim: int = 50
    spin: bool = False
    U112: Tuple[Tuple[Tuple[int, int, int, int], float], ...] = ()
    U1111: Tuple[Tuple[Tuple[int, int, int, int], float], ...] = ()
    U13_IS: tuple = ()
    code: str = ""
    su2: bool = False

    def __post_init__(self):
        def freeze(m):
            arr = _np.asarray(m, dtype=float)
            return tuple(map(tuple, arr)) if arr.ndim == 2 else tuple(arr)
        object.__setattr__(self, "t", freeze(self.t))
        object.__setattr__(self, "u", freeze(self.u))
        object.__setattr__(self, "J", freeze(self.J))
        if len(self.U13):
            object.__setattr__(self, "U13", freeze(self.U13))
        if isinstance(self.U112, dict):
            object.__setattr__(self, "U112", tuple(sorted(self.U112.items())))
        if isinstance(self.U1111, dict):
            object.__setattr__(self, "U1111", tuple(sorted(self.U1111.items())))
        if self.U13_IS is not None and len(self.U13_IS):
            arr = _np.asarray(self.U13_IS, dtype=float)
            object.__setattr__(self, "U13_IS",
                               tuple(map(tuple, arr.reshape(arr.shape[0], -1))))

    @property
    def bands(self) -> int:
        return len(self.t)

    @property
    def T(self) -> int:
        """Chain unit cell: T cell-sites x B bands, band-major."""
        return unit_cell(self.P, self.Q) * self.bands

    def site(self):
        if self.su2:
            from ..ops.sites_su2 import canonical_su2_site
            return canonical_su2_site(self.P, self.Q)
        return canonical_site(self.P, self.Q)

    def name(self) -> str:
        return "MB"


@dataclass(frozen=True)
class MBCSim(Simulation):
    """B-band grand-canonical Hubbard model (reference MBC_Sim, :214-238).
    The diagonal of the on-site t block acts as per-band chemical potential;
    unit cell is one lattice site (T = B chain sites)."""

    t: tuple
    u: tuple
    J: tuple
    U13: tuple = ()
    svalue: float = 2.0
    bond_dim: int = 50
    spin: bool = False
    U112: Tuple[Tuple[Tuple[int, int, int, int], float], ...] = ()
    U1111: Tuple[Tuple[Tuple[int, int, int, int], float], ...] = ()
    U13_IS: tuple = ()
    code: str = ""
    su2: bool = False

    __post_init__ = MBSim.__post_init__

    @property
    def bands(self) -> int:
        return len(self.t)

    @property
    def T(self) -> int:
        return self.bands

    def site(self):
        if self.spin:
            raise NotImplementedError("Spin not implemented.")  # :216
        if self.su2:
            from ..ops.sites_su2 import grand_su2_site
            return grand_su2_site()
        return grand_site()

    def name(self) -> str:
        return "MBC"


def multi_band_terms(sim) -> List[Term]:
    """Term list for the B-band Hamiltonian (reference :811-910)."""
    import warnings
    B = sim.bands
    Tc = sim.T // B                        # unit cell in lattice sites
    t = _np.asarray(sim.t)
    u = _np.asarray(sim.u)
    J = _np.asarray(sim.J)
    for name, m in (("t", t), ("u", u), ("J", J)):
        if m.shape[0] != B or m.shape[1] % B:
            raise ValueError(f"{name} must be B x (B*(range+1))")
    # input-hermiticity parity (reference :485-489 and the per-term checks)
    if not _np.allclose(t[:, :B], t[:, :B].T.conj()):
        warnings.warn("t_OS is not Hermitian.")
    if _np.all(_np.diag(u[:, :B]) == 0):
        warnings.warn("No on-band interaction found. This may lead to too "
                      "low contributions of other Hamiltonian terms.")  # :858
    for key, _W in tuple(sim.U112):
        if len(set(key)) != 3:
            raise ValueError("Two indices should be the same. "
                             "Not more, not less.")  # :743
    u1111 = dict(tuple(sim.U1111))
    for key, W in u1111.items():
        if len(set(key)) != 4:
            raise ValueError("All indices must be different.")  # :789
        rev = tuple(reversed(key))
        if rev in u1111 and not _np.isclose(W, u1111[rev]):
            warnings.warn("U1111 is not Hermitian.")  # :791
    U13_OS = _np.asarray(sim.U13) if sim.U13 else _np.zeros((B, B))
    U13_IS = (_np.asarray(sim.U13_IS).reshape(B, -1, 4)
              if sim.U13_IS else _np.zeros((B, 0, 4)))

    def pos(s: int, band: int, dist: int = 0) -> int:
        return (s + dist) * B + band

    t_OS = t[:, :B]
    mu = _np.diag(t_OS).copy()
    u_OS = u[:, :B].copy()
    u_OB = _np.diag(u_OS).copy()
    _np.fill_diagonal(u_OS, 0.0)
    J_OS = J[:, :B]

    out: List[Term] = []
    for s in range(Tc):
        for i in range(B):
            if u_OB[i]:
                out += tm.double_occupancy(pos(s, i), u_OB[i])
            if mu[i]:
                out += tm.number(pos(s, i), -mu[i])
        # on-site interband hopping (ordered pairs, reference OS_Hopping)
        for bi in range(B):
            for bf in range(B):
                if bi != bf and t_OS[bi, bf]:
                    out += tm.cdc(pos(s, bf), pos(s, bi), -t_OS[bi, bf])
        # on-site direct (symmetrized lower triangle, reference Direct_OS)
        for bi in range(B):
            for bf in range(bi):
                Uav = 0.5 * (u_OS[bi, bf] + u_OS[bf, bi])
                if Uav:
                    out += tm.density_density(pos(s, bi), pos(s, bf), Uav)
        # on-site exchange and U13 (reference Exchange_OS, Uijjj_OS)
        for bi in range(B):
            for bf in range(bi):
                Jav = 0.5 * (J_OS[bi, bf] + J_OS[bf, bi])
                if Jav:
                    out += tm.exchange(pos(s, bi), pos(s, bf), Jav)
        for bi in range(B):
            for bf in range(B):
                if bi != bf and U13_OS[bi, bf]:
                    out += tm.correlated_hopping(pos(s, bi), pos(s, bf),
                                                 U13_OS[bi, bf])
        # inter-site blocks per distance
        for r in range(1, t.shape[1] // B):
            tr = t[:, r * B:(r + 1) * B]
            for bi in range(B):
                for bf in range(B):
                    if tr[bi, bf]:
                        out += tm.hopping(pos(s, bf, r), pos(s, bi),
                                          -tr[bi, bf])
        for r in range(1, u.shape[1] // B):
            Vr = u[:, r * B:(r + 1) * B]
            for bi in range(B):
                for bf in range(B):
                    if Vr[bi, bf]:
                        out += tm.density_density(pos(s, bi), pos(s, bf, r),
                                                  Vr[bi, bf])
        for r in range(1, J.shape[1] // B):
            Jr = J[:, r * B:(r + 1) * B]
            for bi in range(B):
                for bf in range(B):
                    if Jr[bi, bf]:
                        out += tm.exchange(pos(s, bi), pos(s, bf, r),
                                           Jr[bi, bf])
        for r in range(1, U13_IS.shape[1] // B + 1):
            Xr = U13_IS[:, (r - 1) * B: r * B, :]
            for bi in range(B):
                for bf in range(B):
                    a, b = pos(s, bi), pos(s, bf, r)
                    out += tm.u13_pair(a, b, Xr[bi, bf, 0], Xr[bi, bf, 2])
                    out += tm.u13_pair(b, a, Xr[bi, bf, 1], Xr[bi, bf, 3])
        # general four-index interactions (chemists' tuples, flattened index)
        for key, W in tuple(sim.U112) + tuple(sim.U1111):
            if min(key) > B:
                raise ValueError(
                    "at least one index per tuple must be at cell-site 0")
            chain_key = tuple(m - 1 + s * B for m in key)
            out += tm.quartic_tuple(chain_key, W)
    return out


def _su2_mpo(sim, terms) -> MPOHamiltonian:
    """SU(2) path: JW-compile in the abelian basis, auto-symmetrize into
    coupled strings, emit the channel-leg FSM MPO (mpo/su2_compile.py)."""
    from ..mpo.su2_compile import build_mpo_su2, symmetrize_terms
    from ..ops.fermions import compile_terms
    if isinstance(sim, (OBCSim, MBCSim)):
        ab_site = grand_site()
    else:
        ab_site = canonical_site(sim.P, sim.Q)
    su_site = sim.site()
    su_terms = symmetrize_terms(ab_site, su_site, compile_terms(ab_site, terms))
    return build_mpo_su2(su_site, sim.T, su_terms)


def hamiltonian(sim) -> MPOHamiltonian:
    """Compile a simulation's Hamiltonian to an FSM MPO."""
    if isinstance(sim, OBSim):
        if sim.su2:
            return _su2_mpo(sim, one_band_terms(sim))
        return mpo_from_terms(sim.site(), sim.T, one_band_terms(sim))
    if isinstance(sim, OBCSim):
        if sim.mu is None:
            raise ValueError("OBCSim with target filling: use the mu search "
                             "(compute_groundstate), not hamiltonian()")
        if sim.su2:
            return _su2_mpo(sim, one_band_terms(sim))
        return mpo_from_terms(sim.site(), sim.T, one_band_terms(sim))
    if isinstance(sim, (MBSim, MBCSim)):
        if getattr(sim, "su2", False):
            return _su2_mpo(sim, multi_band_terms(sim))
        return mpo_from_terms(sim.site(), sim.T, multi_band_terms(sim))
    raise TypeError(f"unsupported simulation type {type(sim)!r}")
