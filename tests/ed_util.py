"""Dense exact-diagonalization utilities (ground truth for fermionic signs).

Every elementary fermionic operator is embedded on the finite chain with its
full explicit Jordan-Wigner string, so products of these dense operators obey
the exact fermionic algebra.  This is the reference point against which the
JW term compiler and the FSM MPO builder are validated.
"""

from __future__ import annotations

import numpy as np

from hubbardtn_tpu.ops.sites import Site


def embed_op(site: Site, n_sites: int, pos: int, name: str) -> np.ndarray:
    """Dense operator for o(pos) on an n-site chain, with JW string."""
    d = site.space.total_dim
    mat = np.asarray(site.op(name).to_dense(), dtype=np.complex128)
    Z = np.asarray(site.op("Z").to_dense(), dtype=np.complex128)
    parity = site.parity(name)
    out = np.eye(1, dtype=np.complex128)
    for k in range(n_sites):
        if k < pos:
            out = np.kron(out, Z if parity else np.eye(d))
        elif k == pos:
            out = np.kron(out, mat)
        else:
            out = np.kron(out, np.eye(d))
    return out


def term_dense(site: Site, n_sites: int, term) -> np.ndarray:
    """Dense representation of a Term (product in operator order)."""
    d = site.space.total_dim
    out = np.eye(d ** n_sites, dtype=np.complex128)
    for pos, name in term.ops:
        out = out @ embed_op(site, n_sites, pos, name)
    return term.coeff * out


def compiled_dense(site: Site, n_sites: int, ct) -> np.ndarray:
    """Dense representation of a CompiledTerm (local matrices, no strings)."""
    d = site.space.total_dim
    out = np.eye(1, dtype=np.complex128)
    for k in range(n_sites):
        j = k - ct.start
        if 0 <= j < ct.length:
            out = np.kron(out, np.asarray(ct.mats[j].to_dense(), dtype=np.complex128))
        else:
            out = np.kron(out, np.eye(d))
    return ct.coeff * out


def terms_dense(site: Site, n_sites: int, terms) -> np.ndarray:
    """Dense H = sum of terms on the finite chain."""
    d = site.space.total_dim
    H = np.zeros((d ** n_sites, d ** n_sites), dtype=np.complex128)
    for t in terms:
        H += term_dense(site, n_sites, t)
    return H
