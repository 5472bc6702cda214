"""Graded vector spaces for abelian symmetries.

TPU-native equivalent of TensorKit's ``Vect[I](sector => dim, ...)`` used
throughout the reference (e.g. /root/reference/src/HubbardFunctions.jl:248,
251, 931-948).  A :class:`Space` is an immutable, hashable map
``sector -> multiplicity``; hashability makes it legal static metadata (jit
constants) for the block tables of :class:`SymTensor`.

Supported operations mirror the reference call sites:
``fuse`` (TensorKit ``fuse``), ``dual``, ``infimum`` (:922-956), ``oplus``
(direct sum, TensorKit ``⊕``).
"""

from __future__ import annotations

from functools import total_ordering
from typing import Dict, Iterable, Mapping, Tuple

from .groups import AbelianGroup, Sector


@total_ordering
class Space:
    """Immutable graded vector space: ordered (sector, dim) pairs."""

    __slots__ = ("group", "_items", "_dims")

    def __init__(self, group: AbelianGroup, items: Mapping[Sector, int] | Iterable[Tuple[Sector, int]]):
        if isinstance(items, Mapping):
            pairs = items.items()
        else:
            pairs = items
        merged: Dict[Sector, int] = {}
        for s, d in pairs:
            s = tuple(int(x) for x in s)
            if d < 0:
                raise ValueError(f"negative multiplicity for sector {s}")
            if d == 0:
                continue
            merged[s] = merged.get(s, 0) + int(d)
        object.__setattr__(self, "group", group)
        object.__setattr__(self, "_items", tuple(sorted(merged.items())))
        object.__setattr__(self, "_dims", dict(merged))

    def __setattr__(self, *a):  # immutability
        raise AttributeError("Space is immutable")

    def __reduce__(self):  # picklable despite immutability
        return (Space, (self.group, self._items))

    # --- basic queries -------------------------------------------------
    @property
    def sectors(self) -> Tuple[Sector, ...]:
        return tuple(s for s, _ in self._items)

    @property
    def items(self) -> Tuple[Tuple[Sector, int], ...]:
        return self._items

    def dim_of(self, sector: Sector) -> int:
        return self._dims.get(tuple(sector), 0)

    @property
    def total_dim(self) -> int:
        return sum(d for _, d in self._items)

    def __contains__(self, sector: Sector) -> bool:
        return tuple(sector) in self._dims

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __eq__(self, other) -> bool:
        return isinstance(other, Space) and self.group is other.group and self._items == other._items

    def __lt__(self, other) -> bool:
        return self._items < other._items

    def __hash__(self):
        return hash((id(self.group), self._items))

    def __repr__(self):
        body = ", ".join(f"{s}=>{d}" for s, d in self._items)
        return f"Space[{self.group}]({body})"

    # --- offsets for leg fusion ----------------------------------------
    def offsets(self) -> Dict[Sector, int]:
        """Start offset of each sector when the space is laid out densely."""
        out, off = {}, 0
        for s, d in self._items:
            out[s] = off
            off += d
        return out

    # --- quantum dimensions (nontrivial only for SU(2) factors) ---------
    def qdim(self, sector: Sector) -> int:
        return self.group.qdim(tuple(sector))

    def dense_dim_of(self, sector: Sector) -> int:
        """Dense dimension of one sector: multiplicity x quantum dimension."""
        return self.dim_of(sector) * self.group.qdim(tuple(sector))

    @property
    def dense_dim(self) -> int:
        return sum(self.dense_dim_of(s) for s, _ in self._items)

    def dense_offsets(self) -> Dict[Sector, int]:
        """Dense start offsets; within a sector, layout is (mult, m) with the
        m-axis fastest."""
        out, off = {}, 0
        for s, _ in self._items:
            out[s] = off
            off += self.dense_dim_of(s)
        return out

    # --- algebra --------------------------------------------------------
    def dual(self) -> "Space":
        g = self.group
        return Space(g, {g.dual(s): d for s, d in self._items})

    def fuse(self, other: "Space") -> "Space":
        """Fused space; for SU(2) factors each coupling outcome contributes
        multiplicity d1*d2 (SU(2) fusion is multiplicity-free per outcome)."""
        g = self.group
        out: Dict[Sector, int] = {}
        for s1, d1 in self._items:
            for s2, d2 in other._items:
                for s in g.fuse_outcomes(s1, s2):
                    out[s] = out.get(s, 0) + d1 * d2
        return Space(g, out)

    def oplus(self, other: "Space") -> "Space":
        out: Dict[Sector, int] = dict(self._dims)
        for s, d in other._items:
            out[s] = out.get(s, 0) + d
        return Space(self.group, out)

    def infimum(self, other: "Space") -> "Space":
        """Sector-wise minimum multiplicity (TensorKit.infimum)."""
        out = {}
        for s, d in self._items:
            d2 = other.dim_of(s)
            if d2:
                out[s] = min(d, d2)
        return Space(self.group, out)

    def cap(self, max_dim: int) -> "Space":
        """Cap every sector multiplicity at max_dim."""
        return Space(self.group, {s: min(d, max_dim) for s, d in self._items})


def fuse_many(spaces: Iterable[Space]) -> Space:
    spaces = list(spaces)
    out = spaces[0]
    for sp in spaces[1:]:
        out = out.fuse(sp)
    return out


def one(group: AbelianGroup) -> Space:
    """The unit space: trivial sector with multiplicity 1."""
    return Space(group, {group.trivial: 1})
