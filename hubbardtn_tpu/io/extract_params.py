"""Ab-initio parameter import (PyFoldHub format).

TPU-native equivalent of the reference's ``extract_params``
(/root/reference/src/HubbardFunctions.jl:1581-1667): extract model-ready
t/U/J/U13/U112/U1111 structures from the screened-interaction tensor ``Wmn``
(rank 8: four site indices then four orbital indices, single frequency
point), the hopping ``tmn``, and the Hartree correction ``corr_H``.

Inputs are numpy arrays (or a path to an ``.npz`` containing keys ``Wmn``,
``tmn``, ``corr_H``); indices are 0-based.  Tuples in the returned
``U112``/``U1111`` dicts are 1-based flattened band+distance indices in
*operator order* (Cd_i Cd_j C_k C_l), matching the convention consumed by
``MBSim`` (models/hubbard.py).
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import numpy as np


def _consistent(a, b, rtol=1e-5, atol=1e-12):
    return np.isclose(a, b, rtol=rtol, atol=atol)


def extract_params(source: Union[str, dict], range_u: int = 1,
                   range_t: int = 2, range_J: int = 1, range_U13: int = 1,
                   r_1111: int = 1, r_112: int = 1):
    """Returns (t, U, J, U13_OS, U13_IS, U112, U1111)."""
    if isinstance(source, str):
        data = np.load(source)
        Wmn, tmn = np.asarray(data["Wmn"]), np.asarray(data["tmn"])
        corr_H = np.asarray(data["corr_H"]) if "corr_H" in data else np.zeros_like(tmn)
    else:
        Wmn = np.asarray(source["Wmn"])
        tmn = np.asarray(source["tmn"])
        corr_H = np.asarray(source.get("corr_H", np.zeros_like(tmn)))

    B = Wmn.shape[4]
    s0 = Wmn.shape[0] // 2  # central site of the cluster (reference ceil/2)

    t = np.zeros((B, B * range_t))
    U = np.zeros((B, B * range_u))
    J = np.zeros((B, B * range_J))
    U13_OS = np.zeros((B, B))
    n_is = max(1, range_U13 - 1) if range_U13 > 1 else range_U13
    U13_IS = np.zeros((B, B * n_is, 4)) if range_U13 > 1 else np.zeros((B, B, 4))

    for i in range(B):
        for j in range(B):
            for r in range(range_t):
                t[i, j + r * B] = tmn[s0 + r, i, j] + corr_H[s0 + r, i, j]
            for r in range(range_u):
                U[i, j + r * B] = Wmn[s0, s0, s0 + r, s0 + r, i, i, j, j]
            for r in range(range_J):
                if r != 0 or i != j:
                    J[i, j + r * B] = Wmn[s0, s0 + r, s0 + r, s0, i, j, j, i]
                    if not _consistent(J[i, j + r * B],
                                       Wmn[s0, s0 + r, s0, s0 + r, i, j, i, j]):
                        raise ValueError(
                            f"J1 is not equal to J2 at (r,i,j)=({r},{i},{j}).")
            for r in range(1, range_U13):
                c = (r - 1) * B
                U13_IS[i, j + c, 0] = Wmn[s0, s0 + r, s0 + r, s0 + r, i, j, j, j]
                U13_IS[i, j + c, 1] = Wmn[s0 + r, s0 + r, s0, s0 + r, j, j, i, j]
                U13_IS[i, j + c, 2] = Wmn[s0 + r, s0, s0, s0, j, i, i, i]
                U13_IS[i, j + c, 3] = Wmn[s0, s0, s0 + r, s0, i, i, j, i]
                checks = [
                    (U13_IS[i, j + c, 0], Wmn[s0 + r, s0, s0 + r, s0 + r, j, i, j, j]),
                    (U13_IS[i, j + c, 1], Wmn[s0 + r, s0 + r, s0 + r, s0, j, j, j, i]),
                    (U13_IS[i, j + c, 2], Wmn[s0, s0 + r, s0, s0, i, j, i, i]),
                    (U13_IS[i, j + c, 3], Wmn[s0, s0, s0, s0 + r, i, i, i, j]),
                ]
                if not all(_consistent(a, b) for a, b in checks):
                    raise ValueError("U13_IS not consistent.")
            if i != j:
                U13_OS[i, j] = Wmn[s0, s0, s0, s0, i, j, j, j]
                partners = [Wmn[s0, s0, s0, s0, j, i, j, j],
                            Wmn[s0, s0, s0, s0, j, j, i, j],
                            Wmn[s0, s0, s0, s0, j, j, j, i]]
                if not all(_consistent(U13_OS[i, j], p, rtol=1e-3)
                           for p in partners):
                    print(f"Warning: U13_OS not consistent at i={i}, j={j} "
                          "for rtol=1e-3.")
                    if not all(_consistent(U13_OS[i, j], p, atol=1e-3)
                               for p in partners):
                        raise ValueError(
                            f"U13_OS not consistent at i={i}, j={j}.")

    # chemical-potential shift: minimum on-site diagonal goes to zero
    mu = np.min(np.diag(t[:, :B]))
    t[:, :B] -= mu * np.eye(B)

    def _dict_terms(r_max: int, distinct: int) -> Dict[Tuple[int, int, int, int], float]:
        out: Dict[Tuple[int, int, int, int], float] = {}
        n = r_max * B
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                for k in range(1, n + 1):
                    for l in range(1, n + 1):
                        uniq = len(set((i, j, k, l)))
                        if uniq != distinct or min(i, j, k, l) > B:
                            continue
                        idx = []
                        for m in (i, j, k, l):
                            idx.append((s0 + (m - 1) // B, (m - 1) % B))
                        (si, bi), (sj, bj), (sk, bk), (sl, bl) = idx
                        # reorder to operator order (Cd Cd C C): (i,k,l,j)
                        out[(i, k, l, j)] = float(
                            Wmn[si, sj, sk, sl, bi, bj, bk, bl])
        return out

    U112 = _dict_terms(r_112, 3)
    U1111 = _dict_terms(r_1111, 4)
    return t, U, J, U13_OS, U13_IS, U112, U1111
