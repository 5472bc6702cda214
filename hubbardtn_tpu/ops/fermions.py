"""Jordan-Wigner compilation of fermionic operator strings.

The reference leans on TensorKit's fermionic (graded) tensor contractions to
encode statistics (e.g. the @planar/@tensor operator algebra at
/root/reference/src/HubbardFunctions.jl:278-292,426-434).  The TPU-native
design instead resolves all fermionic signs *at MPO-compile time* via
Jordan-Wigner strings, so the runtime tensor network is an ordinary graded
network and every contraction is a plain blocked matmul on the MXU.

Given a product of elementary local operators  o_1(y_1) o_2(y_2) ... o_m(y_m)
(arbitrary site order, each with fermionic parity f_i), ``jw_compile`` returns
the equivalent chain of purely-local matrices, one per site in the occupied
range, with all signs folded into the coefficient:

1. stable-sort the factors by site; each transposition of two odd-parity
   factors at different sites contributes a factor (-1);
2. pulling each fermionic factor's JW string to the far left contributes
   (-1)^{# earlier odd factors at strictly smaller sites};
3. site k receives  Z^{e_k} . (product of the local matrices at k, in sorted
   order),  where  e_k = parity of the number of odd factors at sites > k;
   unvisited sites in the range receive a bare Z when e_k = 1.

Correctness is pinned by exhaustive comparison against dense exact
diagonalization with explicit JW strings (tests/test_fermions.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..tensor.symtensor import SymTensor, tensordot
from .sites import Site


@dataclass(frozen=True)
class Term:
    """coeff * o_1(pos_1) ... o_m(pos_m), ops listed in operator order."""

    coeff: float
    ops: Tuple[Tuple[int, str], ...]  # (chain position, op name in Site.ops)

    def shifted(self, delta: int) -> "Term":
        return Term(self.coeff, tuple((p + delta, name) for p, name in self.ops))


def _matmul(a: SymTensor, b: SymTensor) -> SymTensor:
    """Compose two local operators: (a o b) with legs (p OUT, p IN)."""
    return tensordot(a, b, axes=([1], [0]))


@dataclass
class CompiledTerm:
    """A JW-compiled term: consecutive local matrices starting at ``start``."""

    coeff: float
    start: int
    mats: Tuple[SymTensor, ...]  # one per site in [start, start+len)
    fingerprints: Tuple[Tuple, ...]  # hashable ids for dedup/merging

    @property
    def length(self) -> int:
        return len(self.mats)


def _fingerprint(op: SymTensor) -> Tuple:
    parts = [op.charge]
    for key in sorted(op.blocks.keys()):
        arr = np.asarray(op.blocks[key], dtype=np.complex128)
        parts.append((key, np.round(arr, 12).tobytes()))
    return tuple(parts)


def jw_compile(site: Site, term: Term, tol: float = 1e-14) -> CompiledTerm | None:
    """Compile a Term to purely local matrices; returns None if it vanishes."""
    ops = [(pos, name, site.parity(name)) for pos, name in term.ops]
    if sum(p for _, _, p in ops) % 2 == 1:
        raise ValueError("term has odd fermion parity; its JW string extends to infinity")

    # 1. stable sort by position, tracking fermionic transposition signs
    sign = 1.0
    arr = list(ops)
    for i in range(1, len(arr)):
        j = i
        while j > 0 and arr[j - 1][0] > arr[j][0]:
            if arr[j - 1][2] == 1 and arr[j][2] == 1:
                sign = -sign
            arr[j - 1], arr[j] = arr[j], arr[j - 1]
            j -= 1

    # 2. string-extraction sign
    for i in range(len(arr)):
        if arr[i][2] == 1:
            n_earlier = sum(1 for j in range(i) if arr[j][2] == 1 and arr[j][0] < arr[i][0])
            if n_earlier % 2 == 1:
                sign = -sign

    start = arr[0][0]
    stop = arr[-1][0]
    Z = site.op("Z")
    I = site.op("id")

    mats: List[SymTensor] = []
    fps: List[Tuple] = []
    for k in range(start, stop + 1):
        e_k = sum(1 for pos, _, par in arr if par == 1 and pos > k) % 2
        local = Z if e_k else None
        for pos, name, _ in arr:
            if pos == k:
                m = site.op(name)
                local = m if local is None else _matmul(local, m)
        if local is None:
            local = I
        # detect identically-zero local matrix (e.g. c_up c_up)
        if local.blocks:
            mx = max(float(np.max(np.abs(np.asarray(b)))) for b in local.blocks.values())
        else:
            mx = 0.0
        if mx < tol:
            return None
        mats.append(local)
        fps.append(_fingerprint(local))

    return CompiledTerm(sign * term.coeff, start, tuple(mats), tuple(fps))


def compile_terms(site: Site, terms: Sequence[Term], tol: float = 1e-12) -> List[CompiledTerm]:
    """JW-compile a term list and merge terms with identical operator content
    (positions + local matrices), summing coefficients.  Zero terms drop out;
    this canonicalization keeps the FSM MPO minimal."""
    merged: Dict[Tuple, CompiledTerm] = {}
    for t in terms:
        ct = jw_compile(site, t)
        if ct is None:
            continue
        key = (ct.start, ct.fingerprints)
        if key in merged:
            old = merged[key]
            merged[key] = CompiledTerm(old.coeff + ct.coeff, old.start, old.mats, old.fingerprints)
        else:
            merged[key] = ct
    return [ct for ct in merged.values() if abs(ct.coeff) > tol]
