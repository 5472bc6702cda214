"""Abelian symmetry groups and sectors.

TPU-native rework of the sector layer the reference delegates to
TensorKitSectors (reference: /root/reference/src/HubbardFunctions.jl:245-255,
341-346 uses ``fZ2 x SU2 x U1`` / ``fZ2 x U1 x U1`` product sectors).

Design: a sector is a plain tuple of ints, one entry per group factor.  All
sector arithmetic happens at *trace time* in Python -- sectors never touch the
device, they only key the static block tables of :class:`SymTensor`.  This is
the "static sector tables computed in Python at trace time" plan of
SURVEY.md section 2B.

SU(2) is represented through its U(1) Sz subgroup (charge = 2*Sz), which keeps
the tensor core purely abelian so contractions lower directly to batched
``dot_general`` on the MXU.  Physics observables (energies, dispersions) are
representation independent; the non-abelian fusion-tree optimization is a
planned performance extension, not a capability gap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Tuple

Sector = Tuple[int, ...]


@dataclass(frozen=True)
class GroupFactor:
    """One abelian factor. kind: 'Z' (cyclic of order n) or 'U1'."""

    kind: str
    n: int = 0  # order for cyclic groups

    def fuse(self, a: int, b: int) -> int:
        if self.kind == "Z":
            return (a + b) % self.n
        return a + b

    def dual(self, a: int) -> int:
        if self.kind == "Z":
            return (-a) % self.n
        return -a

    @property
    def trivial(self) -> int:
        return 0


@dataclass(frozen=True)
class AbelianGroup:
    """A product of abelian factors; fermion parity is factor 0 by convention."""

    factors: Tuple[GroupFactor, ...]
    names: Tuple[str, ...]

    def fuse(self, a: Sector, b: Sector) -> Sector:
        return tuple(f.fuse(x, y) for f, x, y in zip(self.factors, a, b))

    def dual(self, a: Sector) -> Sector:
        return tuple(f.dual(x) for f, x in zip(self.factors, a))

    @property
    def trivial(self) -> Sector:
        return tuple(f.trivial for f in self.factors)

    def fuse_many(self, sectors: Iterable[Sector]) -> Sector:
        out = self.trivial
        for s in sectors:
            out = self.fuse(out, s)
        return out

    def parity(self, a: Sector) -> int:
        """Fermion parity of a sector (factor 0 is fZ2 by convention)."""
        return a[0] % 2

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return "x".join(self.names)


def _group_by_name(name: str) -> "AbelianGroup":
    """Intern groups on unpickle so identity-based equality survives."""
    return _GROUP_REGISTRY[name]


def _register(group: "AbelianGroup") -> "AbelianGroup":
    _GROUP_REGISTRY[str(group)] = group
    return group


AbelianGroup.__reduce__ = lambda self: (_group_by_name, (str(self),))

_GROUP_REGISTRY: dict = {}

FZ2 = GroupFactor("Z", 2)
U1 = GroupFactor("U1")

# fZ2 x U1(2Sz) x U1(Q*n - P): the canonical (fixed filling) symmetry.
# Mirrors reference SymSpace(P, Q, spin) at src/HubbardFunctions.jl:245-255;
# the SU(2) variant of the reference is represented via its Sz subgroup.
FERMION_SPIN_CHARGE = _register(
    AbelianGroup((FZ2, U1, U1), ("fZ2", "U1sz", "U1c")))

# fZ2 x U1(2Sz): grand-canonical symmetry (particle number free to adjust).
# Mirrors reference SymSpace() at src/HubbardFunctions.jl:341-346.
FERMION_SPIN = _register(AbelianGroup((FZ2, U1), ("fZ2", "U1sz")))
