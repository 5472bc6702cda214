"""Numeric SU(2) fusion-tree tensors.

The non-abelian core of the framework (TensorKit fusion-tree equivalent,
SURVEY.md section 2B).  A tensor over a group with an SU(2) factor stores,
per sector key, one reduced block per *fusion tree*; the map between reduced
blocks and dense arrays is an explicit orthonormal "structure tensor" built
from Clebsch-Gordan chains.  Every recoupling coefficient the tensor engine
needs (transpose, conjugation, arrow flips, contraction projections, leg
fusion for QR/SVD) is computed here numerically by contracting these
structure tensors -- no hand-derived 6j/9j algebra anywhere.

Conventions
-----------
* legs are fused strictly left to right: x_2 in j_1 x j_2, x_3 in x_2 x j_3,
  ..., x_n == the tensor charge.  A tree label is the tuple (x_2 .. x_{n-1})
  of doubled intermediate spins (length max(n-2, 0)).
* the structure tensor S has one m-axis per leg (ascending m) plus a final
  M-axis for the charge.
* an IN arrow composes the leg with the self-duality conjugator C
  (su2.conj_mat) on the left: S = C_i . S0 along axis i.  Dense indices of
  IN legs therefore transform in the dual representation, matching the
  abelian convention (flux = sum_out - sum_in).

Orthonormality: for fixed (tjs, arrows, charge), the S[tree] are orthonormal
under full contraction (all m-axes and M) -- CG chains with distinct
intermediates are, and the per-leg unitaries C preserve it.  All projections
in the tensor engine rely on exactly this property and assert completeness.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

from .su2 import allowed_couplings, cg_array, conj_mat

Tree = Tuple[int, ...]


@lru_cache(maxsize=None)
def enumerate_trees(tjs: Tuple[int, ...], tjc: int) -> Tuple[Tree, ...]:
    """All fusion trees (intermediate doubled spins) for legs ``tjs`` fused
    left-to-right into total charge ``tjc``.  Arrow directions do not change
    the label set (SU(2) is self-dual)."""
    n = len(tjs)
    if n == 0:
        return ((),) if tjc == 0 else ()
    if n == 1:
        return ((),) if tjs[0] == tjc else ()

    trees: List[Tree] = []

    def rec(k: int, x: int, partial: Tree):
        # x = coupled spin of legs 0..k-1
        if k == n:
            if x == tjc:
                trees.append(partial)
            return
        for y in allowed_couplings(x, tjs[k]):
            nxt = partial + ((y,) if k < n - 1 else ())
            rec(k + 1, y, nxt)

    rec(1, tjs[0], ())
    return tuple(trees)


@lru_cache(maxsize=None)
def tree_tensor(tjs: Tuple[int, ...], arrows: Tuple[bool, ...], tjc: int,
                tree: Tree) -> np.ndarray:
    """Structure tensor, axes (m_1, ..., m_n, M), float64."""
    n = len(tjs)
    assert len(arrows) == n
    if n == 0:
        assert tjc == 0
        return np.ones((1,))
    # chain of CGs in the all-OUT picture
    # A has axes (m_1..m_k, mu) where mu indexes the running coupled spin
    A = np.eye(tjs[0] + 1)  # (m1, mu) with x1 = tjs[0]
    x = tjs[0]
    inter = tuple(tree) + (tjc,)
    for k in range(1, n):
        y = inter[k - 1]
        C = cg_array(x, tjs[k], y)          # (mu, m_k, nu)
        A = np.tensordot(A, C, axes=([A.ndim - 1], [0]))  # (..m_{k-1}, m_k, nu)
        x = y
    # apply conjugators on IN legs
    for i in range(n):
        if not arrows[i]:  # IN
            A = np.moveaxis(
                np.tensordot(conj_mat(tjs[i]), A, axes=([1], [i])), 0, i)
    # Frobenius-normalize: the CG chain is an isometry per M-column, so its
    # total Frobenius norm is sqrt(2J+1); dividing makes the tree basis
    # orthonormal under full contraction (incl. the M-axis), which keeps all
    # projections and inner products in the tensor engine weight-free.
    A = A / np.sqrt(tjc + 1.0)
    A.setflags(write=False)
    return A


@lru_cache(maxsize=None)
def overlap_matrix(tjs: Tuple[int, ...], arrows: Tuple[bool, ...], tjc: int
                   ) -> np.ndarray:
    """Gram matrix of the tree basis (identity if conventions are right);
    kept as a cheap self-check hook for tests."""
    trees = enumerate_trees(tjs, tjc)
    S = [tree_tensor(tjs, arrows, tjc, t) for t in trees]
    G = np.zeros((len(S), len(S)))
    for i, a in enumerate(S):
        for j, b in enumerate(S):
            G[i, j] = float(np.sum(a * b))
    return G


def project_onto_trees(tjs: Tuple[int, ...], arrows: Tuple[bool, ...],
                       tjc: int, dense: np.ndarray, rtol: float = 1e-10
                       ) -> Tuple[Tuple[Tree, ...], np.ndarray, float]:
    """Expand a numeric structure expression in the (orthonormal) tree basis.

    ``dense`` has axes (m_1..m_n, M).  Returns (trees, coeffs, residual);
    residual is the squared norm *fraction* outside the span (callers assert
    ~0; the squared measure avoids sqrt-amplified float noise)."""
    trees = enumerate_trees(tjs, tjc)
    coeffs = np.zeros((len(trees),))
    for i, t in enumerate(trees):
        S = tree_tensor(tjs, arrows, tjc, t)
        coeffs[i] = float(np.sum(S * dense))
    nrm2 = float(np.sum(dense * dense))
    resid2 = nrm2 - float(np.sum(coeffs ** 2))
    resid = max(resid2, 0.0) / nrm2 if nrm2 > 0 else 0.0
    return trees, coeffs, resid
