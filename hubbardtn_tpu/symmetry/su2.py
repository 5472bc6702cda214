"""SU(2) Clebsch-Gordan data (exact rational arithmetic -> float64).

The reference inherits SU(2) recoupling from TensorKitSectors/WignerSymbols
(SURVEY.md section 2B, "Graded vector spaces & sectors").  The TPU-native
framework needs only two primitives -- Condon-Shortley CG arrays and the
self-duality conjugator -- because every other recoupling coefficient
(transpose, conjugation, arrow flips, leg fusion, tensordot projections) is
computed *numerically* by contracting explicit fusion-tree tensors built from
these (see symmetry/trees.py).  That removes the entire class of hand-derived
6j/9j sign-convention bugs: conventions only have to be self-consistent, and
the tests pin consistency by round-tripping against dense tensors.

Spin labels are twice the spin (``tj = 2j``), always ints.  m-axes are
indexed ascending: index ``i`` <-> ``m = i - j`` (i.e. ``2m = 2i - tj``).
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache
from math import factorial

import numpy as np


def allowed_couplings(tj1: int, tj2: int):
    """All 2J with |j1-j2| <= J <= j1+j2 (integer steps in J)."""
    return tuple(range(abs(tj1 - tj2), tj1 + tj2 + 1, 2))


def _f(n: int) -> int:
    if n < 0:
        raise ValueError("negative factorial argument")
    return factorial(n)


def _cg_coeff(tj1: int, tm1: int, tj2: int, tm2: int, tJ: int, tM: int) -> float:
    """<j1 m1 j2 m2 | J M> in the Condon-Shortley convention (Racah form).

    All spins/m's passed doubled; result exact-rational under the square
    root, returned as float64."""
    if tm1 + tm2 != tM:
        return 0.0
    if tJ not in allowed_couplings(tj1, tj2) or abs(tM) > tJ:
        return 0.0
    if (tj1 + tm1) % 2 or (tj2 + tm2) % 2 or (tJ + tM) % 2:
        return 0.0

    # every factorial argument below is an integer (halves cancel)
    def h(x: int) -> int:  # x is a doubled value, must be even
        assert x % 2 == 0
        return x // 2

    pref = Fraction(
        (tJ + 1)
        * _f(h(tJ + tj1 - tj2)) * _f(h(tJ - tj1 + tj2)) * _f(h(tj1 + tj2 - tJ)),
        _f(h(tj1 + tj2 + tJ) + 1),
    ) * Fraction(
        _f(h(tJ + tM)) * _f(h(tJ - tM))
        * _f(h(tj1 - tm1)) * _f(h(tj1 + tm1))
        * _f(h(tj2 - tm2)) * _f(h(tj2 + tm2)),
        1,
    )

    s = Fraction(0)
    k = 0
    while True:
        a1 = h(tj1 + tj2 - tJ) - k
        a2 = h(tj1 - tm1) - k
        a3 = h(tj2 + tm2) - k
        a4 = h(tJ - tj2 + tm1) + k
        a5 = h(tJ - tj1 - tm2) + k
        if a1 < 0 or a2 < 0 or a3 < 0:
            break
        if a4 >= 0 and a5 >= 0:
            term = Fraction(
                (-1) ** k,
                _f(k) * _f(a1) * _f(a2) * _f(a3) * _f(a4) * _f(a5),
            )
            s += term
        k += 1
    if s == 0:
        return 0.0
    return float(np.sqrt(float(pref))) * float(s)


@lru_cache(maxsize=None)
def cg_array(tj1: int, tj2: int, tJ: int) -> np.ndarray:
    """CG array, axes (m1, m2, M) each ascending, shape (tj1+1, tj2+1, tJ+1)."""
    out = np.zeros((tj1 + 1, tj2 + 1, tJ + 1))
    for i1 in range(tj1 + 1):
        tm1 = 2 * i1 - tj1
        for i2 in range(tj2 + 1):
            tm2 = 2 * i2 - tj2
            tM = tm1 + tm2
            if abs(tM) <= tJ and (tJ + tM) % 2 == 0:
                out[i1, i2, (tM + tJ) // 2] = _cg_coeff(tj1, tm1, tj2, tm2, tJ, tM)
    return out


@lru_cache(maxsize=None)
def conj_mat(tj: int) -> np.ndarray:
    """Self-duality isomorphism C: |j m> -> (-1)^(j-m) |j -m>.

    C[i, i'] nonzero for i' = tj - i with sign (-1)^(tj - i) (= (-1)^(j-m),
    integer because j - m always is)."""
    C = np.zeros((tj + 1, tj + 1))
    for i in range(tj + 1):
        C[i, tj - i] = (-1.0) ** (tj - i)
    return C
