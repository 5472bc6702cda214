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
from typing import Iterable, List, Tuple

Sector = Tuple[int, ...]


@dataclass(frozen=True)
class GroupFactor:
    """One group factor. kind: 'Z' (cyclic of order n), 'U1', or 'SU2'.

    SU2 sector labels are twice the spin (tj = 2j, a non-negative int);
    fusion is multivalued (handled by :meth:`outcomes`) and the factor is
    self-dual with quantum dimension 2j+1."""

    kind: str
    n: int = 0  # order for cyclic groups

    def fuse(self, a: int, b: int) -> int:
        if self.kind == "Z":
            return (a + b) % self.n
        if self.kind == "SU2":
            raise ValueError("SU(2) fusion is multivalued; use outcomes()")
        return a + b

    def outcomes(self, a: int, b: int) -> Tuple[int, ...]:
        if self.kind == "SU2":
            return tuple(range(abs(a - b), a + b + 1, 2))
        return (self.fuse(a, b),)

    def dual(self, a: int) -> int:
        if self.kind == "Z":
            return (-a) % self.n
        if self.kind == "SU2":
            return a
        return -a

    def qdim(self, a: int) -> int:
        return a + 1 if self.kind == "SU2" else 1

    @property
    def trivial(self) -> int:
        return 0


@dataclass(frozen=True)
class AbelianGroup:
    """A product of group factors; fermion parity is factor 0 by convention.

    Despite the (historical) name this may contain one SU(2) factor, in
    which case ``fuse`` only works when unambiguous (one operand trivial in
    the SU(2) slot) and multivalued fusion goes through
    :meth:`fuse_outcomes`.  Tensors over such a group use the fusion-tree
    machinery of ``tensor/fusion.py`` rather than the plain abelian
    ``SymTensor``."""

    factors: Tuple[GroupFactor, ...]
    names: Tuple[str, ...]

    def fuse(self, a: Sector, b: Sector) -> Sector:
        out = self.fuse_outcomes(a, b)
        if len(out) != 1:
            raise ValueError(
                f"ambiguous fusion {a} x {b}; use fuse_outcomes()")
        return out[0]

    def fuse_outcomes(self, a: Sector, b: Sector) -> Tuple[Sector, ...]:
        """All sectors in a x b (cartesian product over factor outcomes)."""
        outs: List[Tuple[int, ...]] = [()]
        for f, x, y in zip(self.factors, a, b):
            outs = [o + (z,) for o in outs for z in f.outcomes(x, y)]
        return tuple(outs)

    def dual(self, a: Sector) -> Sector:
        return tuple(f.dual(x) for f, x in zip(self.factors, a))

    @property
    def trivial(self) -> Sector:
        return tuple(f.trivial for f in self.factors)

    @property
    def has_su2(self) -> bool:
        return any(f.kind == "SU2" for f in self.factors)

    @property
    def su2_slot(self) -> int:
        """Index of the SU(2) factor (at most one supported); -1 if none."""
        for i, f in enumerate(self.factors):
            if f.kind == "SU2":
                return i
        return -1

    def qdim(self, a: Sector) -> int:
        d = 1
        for f, x in zip(self.factors, a):
            d *= f.qdim(x)
        return d

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
SU2 = GroupFactor("SU2")

# fZ2 x U1(2Sz) x U1(Q*n - P): the canonical (fixed filling) symmetry.
# Mirrors reference SymSpace(P, Q, spin) at src/HubbardFunctions.jl:245-255;
# the SU(2) variant of the reference is represented via its Sz subgroup.
FERMION_SPIN_CHARGE = _register(
    AbelianGroup((FZ2, U1, U1), ("fZ2", "U1sz", "U1c")))

# fZ2 x U1(2Sz): grand-canonical symmetry (particle number free to adjust).
# Mirrors reference SymSpace() at src/HubbardFunctions.jl:341-346.
FERMION_SPIN = _register(AbelianGroup((FZ2, U1), ("fZ2", "U1sz")))

# fZ2 x SU2 x U1(Q*n - P): the reference's default (spin-symmetric) setting,
# src/HubbardFunctions.jl:245-255, with genuine non-abelian SU(2) spin.
FERMION_SU2_CHARGE = _register(
    AbelianGroup((FZ2, SU2, U1), ("fZ2", "SU2", "U1c")))

# fZ2 x SU2: grand-canonical spin-symmetric setting (:341-346).
FERMION_SU2 = _register(AbelianGroup((FZ2, SU2), ("fZ2", "SU2")))
