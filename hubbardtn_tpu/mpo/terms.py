"""Second-quantized term primitives.

The reference builds interactions as TensorKit contractions of a two-site
``cdc`` tensor (/root/reference/src/HubbardFunctions.jl:423-434,580,604,
632-634,714-716,756-765,798-802).  Here every interaction reduces to sums of
one primitive, the chemists'-notation quartic

    quartic(a,b,c,d) = sum_{s,t} c†_{a s} c†_{b t} c_{c t} c_{d s}

so that  H_int = 1/2 * sum_tuples W * quartic(tuple)  with W the chemists'
two-electron tensor -- the convention the reference's ``extract_params``
reads off the PyFoldHub Wmn tensor (:1581-1667).  All reference term builders
(Direct/Exchange/Uijjj/Uijkk/Uijkl) are specific tuple families of this one
primitive; the JW compiler resolves orderings and signs mechanically.
"""

from __future__ import annotations

from typing import List

from ..ops.fermions import Term

SPINS = ("u", "d")


def cdc(a: int, b: int, coeff: float = 1.0) -> List[Term]:
    """coeff * sum_s c†_s(a) c_s(b)."""
    return [Term(coeff, ((a, f"c{s}+"), (b, f"c{s}"))) for s in SPINS]


def hopping(a: int, b: int, coeff: float = 1.0) -> List[Term]:
    """coeff * sum_s (c†_s(a) c_s(b) + h.c.)."""
    return cdc(a, b, coeff) + cdc(b, a, coeff)


def number(a: int, coeff: float = 1.0) -> List[Term]:
    return [Term(coeff, ((a, "n"),))]


def double_occupancy(a: int, coeff: float = 1.0) -> List[Term]:
    """coeff * n_up(a) n_dn(a)  (reference OSInteraction, :298-310)."""
    return [Term(coeff, ((a, "docc"),))]


def szop(a: int, coeff: float = 1.0) -> List[Term]:
    return [Term(coeff, ((a, "sz"),))]


def density_density(a: int, b: int, coeff: float = 1.0) -> List[Term]:
    """coeff * n(a) n(b)."""
    return [Term(coeff, ((a, "n"), (b, "n")))]


def quartic(a: int, b: int, c: int, d: int, coeff: float = 1.0) -> List[Term]:
    """coeff * sum_{s,t} c†_s(a) c†_t(b) c_t(c) c_s(d)."""
    out = []
    for s in SPINS:
        for t in SPINS:
            out.append(Term(coeff, ((a, f"c{s}+"), (b, f"c{t}+"), (c, f"c{t}"), (d, f"c{s}"))))
    return out


def exchange(a: int, b: int, J: float) -> List[Term]:
    """Full exchange coupling J_ab = W_abba = W_abab between sites/orbitals a,b:

        1/2 * J * [quartic(a,b,a,b) + quartic(b,a,b,a)      (W_abba, spin exchange)
                   + quartic(a,a,b,b) + quartic(b,b,a,a)]   (W_abab, pair hopping)  Matches the reference's
    Exchange1+Exchange2 combination (:565-615,668-700) including the overall
    sign: positive J gives the physical (ferromagnetic, Hund) exchange."""
    out: List[Term] = []
    out += quartic(a, b, a, b, 0.5 * J)   # W_abba spin exchange (a<-b sigma line)
    out += quartic(b, a, b, a, 0.5 * J)
    out += quartic(a, a, b, b, 0.5 * J)   # W_abab pair hopping
    out += quartic(b, b, a, a, 0.5 * J)
    return out


def u13_pair(a: int, b: int, X_abbb: float, X_babb: float) -> List[Term]:
    """Three-equal-index terms with independent couplings for the two
    Hermitian pairs: X_abbb = W_abbb (= conj W_bbba) and X_babb = W_babb
    (= conj W_bbab).  Used for inter-site U13 where the four orientations
    are independent (reference Uijjj_IS BxBx4 array, :703-730)."""
    out: List[Term] = []
    if X_abbb != 0.0:
        out += quartic(a, b, b, b, 0.5 * X_abbb)
        out += quartic(b, b, b, a, 0.5 * X_abbb)
    if X_babb != 0.0:
        out += quartic(b, a, b, b, 0.5 * X_babb)
        out += quartic(b, b, a, b, 0.5 * X_babb)
    return out


def correlated_hopping(a: int, b: int, X: float) -> List[Term]:
    """U13 coupling X = W_abbb (= W_babb = W_bbab = W_bbba) for the ordered
    pair (a,b): the four equal chemists' tuples with three b's and one a.
    Reference Uijjj_OS/one-band C1/C2 combination (:429-434,452-458,617-649)."""
    out: List[Term] = []
    out += quartic(a, b, b, b, 0.5 * X)
    out += quartic(b, a, b, b, 0.5 * X)
    out += quartic(b, b, a, b, 0.5 * X)
    out += quartic(b, b, b, a, 0.5 * X)
    return out


def quartic_tuple(key, U: float) -> List[Term]:
    """General four-index interaction entry: 1/2 * U * quartic(key).

    ``key`` lists the four operator slots (Cd, Cd, C, C) as chain positions;
    the caller's dict is expected to contain the Hermitian partner key
    (l,k,j,i) with the same value, as produced by the reference's
    extract_params (:1642-1664) and consumed by Uijkk/Uijkl (:732-809)."""
    a, b, c, d = key
    return quartic(a, b, c, d, 0.5 * U)
