"""Finite-state-machine MPO compiler.

TPU-native equivalent of MPSKitModels' ``@mpoham`` macro + BlockTensorKit's
sparse MPO storage (reference call sites: /root/reference/src/
HubbardFunctions.jl:435-469,498-526,872-908).  Takes JW-compiled terms
(consecutive local matrices per term, all fermionic signs already folded in)
and emits, per unit-cell site, a sparse dict of channel transitions
``(a, b) -> local operator``.

Channel layout per bond: 0 = INIT (identity, nothing applied yet),
last = FINAL (identity, term complete), intermediates in between.  States are
deduplicated by their *suffix* (the remaining operator sequence), so e.g. all
density-density strings of different ranges share Z/identity channels --
the "minimal automaton" of SURVEY.md section 2B.  Term coefficients are
folded into the first operator, so INIT->state edges accumulate sums while
continuation edges are shared verbatim.

The MPO is kept channel-sparse (dict of 2-leg SymTensors, not one 4-leg
tensor): environments and effective Hamiltonians iterate only the nonzero
transitions, which is what makes the VUMPS hot loop lean on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops.fermions import CompiledTerm, Term, compile_terms
from ..ops.sites import Site
from ..symmetry.groups import Sector
from ..tensor.symtensor import SymTensor

INIT = "I"
FINAL = "F"


@dataclass
class MPOHamiltonian:
    """Sparse FSM MPO over a unit cell of ``T`` sites (uniform local space)."""

    site: Site
    T: int
    n_channels: List[int]                      # per bond (bond x = left of site x)
    charges: List[List[Sector]]                # per bond, per channel: env charge
    Ws: List[Dict[Tuple[int, int], SymTensor]]  # per site: (a@bond x, b@bond x+1) -> op
    max_len: int = 1                           # longest term string, in sites

    @property
    def length(self) -> int:
        return self.T

    def idx_init(self, bond: int) -> int:
        return 0

    def idx_final(self, bond: int) -> int:
        return self.n_channels[bond % self.T] - 1

    def max_channels(self) -> int:
        return max(self.n_channels)

    def to_dense_window(self, n_sites: int) -> np.ndarray:
        """Dense Hamiltonian of an open n-site window (INIT at the left edge,
        FINAL at the right edge).  Testing/debugging only."""
        d = self.site.space.total_dim
        vec: Dict[int, np.ndarray] = {0: np.eye(1, dtype=np.complex128)}
        for x in range(n_sites):
            W = self.Ws[x % self.T]
            new: Dict[int, np.ndarray] = {}
            for (a, b), op in W.items():
                if a not in vec:
                    continue
                contrib = np.kron(vec[a], np.asarray(op.to_dense(), dtype=np.complex128))
                if b in new:
                    new[b] = new[b] + contrib
                else:
                    new[b] = contrib
            vec = new
        f = self.idx_final(n_sites % self.T)
        return vec.get(f, np.zeros((d ** n_sites, d ** n_sites), dtype=np.complex128))


def build_mpo(site: Site, T: int, compiled: Sequence[CompiledTerm]) -> MPOHamiltonian:
    """Build the FSM MPO from JW-compiled terms.

    Term starts are taken mod T (the Hamiltonian is the sum over all unit-cell
    translations by T)."""
    # symbolic edges per site: (label_a, label_b) -> op ; labels are INIT,
    # FINAL, or ("S", bond_index, suffix fingerprints)
    edges: List[Dict[Tuple, SymTensor]] = [dict() for _ in range(T)]
    start_edges: List[Dict[Tuple, SymTensor]] = [dict() for _ in range(T)]
    inter_labels: List[set] = [set() for _ in range(T)]
    label_charge: Dict[Tuple, Sector] = {}
    g = site.group

    def add_start(x: int, lbl_b, op: SymTensor):
        key = (INIT, lbl_b)
        if key in start_edges[x]:
            start_edges[x][key] = start_edges[x][key] + op
        else:
            start_edges[x][key] = op

    def set_cont(x: int, lbl_a, lbl_b, op: SymTensor):
        key = (lbl_a, lbl_b)
        if key not in edges[x]:
            edges[x][key] = op  # shared-suffix terms write identical ops

    for ct in compiled:
        s = ct.start % T
        L = ct.length
        if L == 1:
            add_start(s, FINAL, ct.mats[0] * ct.coeff)
            continue
        labels = []
        charge_acc = g.trivial
        for j in range(L - 1):
            bond = (s + j + 1) % T
            suffix = ct.fingerprints[j + 1:]
            lbl = ("S", bond, suffix)
            labels.append(lbl)
            inter_labels[bond].add(lbl)
            charge_acc = g.fuse(charge_acc, ct.mats[j].charge)
            label_charge[lbl] = charge_acc
        add_start(s, labels[0], ct.mats[0] * ct.coeff)
        for j in range(1, L - 1):
            set_cont((s + j) % T, labels[j - 1], labels[j], ct.mats[j])
        set_cont((s + L - 1) % T, labels[L - 2], FINAL, ct.mats[L - 1])

    # index assignment per bond: INIT=0, sorted intermediates, FINAL=last
    index: List[Dict[Tuple, int]] = []
    n_channels: List[int] = []
    charges: List[List[Sector]] = []
    for bond in range(T):
        inters = sorted(inter_labels[bond])
        idx = {INIT: 0}
        ch = [g.trivial]
        for i, lbl in enumerate(inters):
            idx[lbl] = i + 1
            ch.append(label_charge[lbl])
        idx[FINAL] = len(inters) + 1
        ch.append(g.trivial)
        index.append(idx)
        n_channels.append(len(inters) + 2)
        charges.append(ch)

    ident = site.op("id")
    Ws: List[Dict[Tuple[int, int], SymTensor]] = []
    for x in range(T):
        bond_a, bond_b = x, (x + 1) % T
        W: Dict[Tuple[int, int], SymTensor] = {}
        W[(0, 0)] = ident
        W[(index[bond_a][FINAL], index[bond_b][FINAL])] = ident
        for (la, lb), op in start_edges[x].items():
            W[(0, index[bond_b][lb])] = op
        for (la, lb), op in edges[x].items():
            key = (index[bond_a][la], index[bond_b][lb])
            W[key] = op
        Ws.append(W)

    max_len = max((ct.length for ct in compiled), default=1)
    return MPOHamiltonian(site, T, n_channels, charges, Ws, max_len)


def mpo_from_terms(site: Site, T: int, terms: Sequence[Term]) -> MPOHamiltonian:
    """Convenience: JW-compile + merge + FSM-build in one call."""
    return build_mpo(site, T, compile_terms(site, terms))
