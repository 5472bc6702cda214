"""Bond-dimension adaptation: two-site expansion and SVD truncation.

TPU-native equivalent of MPSKit's ``changebonds`` schemes used by the
reference (/root/reference/src/HubbardFunctions.jl:1011-1023 expansion loop,
:1363-1365 truncation):

* :func:`expand_bonds` — the ``VUMPSSvdCut``/``OptimalExpand`` analog: SVD of
  the two-site residual projected on the AL/AR null spaces.  New bond states
  are *appended* (direct sum), so all tensors stay exactly isometric and the
  state is unchanged; subsequent VUMPS iterations populate the new states.
  Works for any unit cell, including T = 1 (both legs of the same tensor
  grow).
* :func:`svd_cut` — the ``SvdCut`` analog: truncate every bond by the
  Schmidt spectrum of C, rotating neighbors into the kept basis, then
  re-gauge.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..mpo.fsm import MPOHamiltonian
from ..mps.imps import UniformMPS, mixed_gauge
from ..tensor import linalg as tla
from ..tensor.symtensor import SymTensor, tensordot
from .environments import Environments
from .vumps import apply_H_AC2


def _expansion_vectors(psi: UniformMPS, H: MPOHamiltonian, envs: Environments,
                       x: int, trunc: tla.Truncation):
    """Dominant two-site residual directions at the bond right of site x:
    returns (dAL (vl,p,k), dAR (k,p,vr)) or None."""
    T = psi.T
    x1 = (x + 1) % T
    AC2 = tensordot(psi.AC(x), psi.ARs[x1], axes=([2], [0]))
    R = apply_H_AC2(envs.GLs[x], H.Ws[x], H.Ws[x1], envs.GRs[x1], AC2)

    NL = tla.left_null(psi.ALs[x], 2)         # (vl, p, nl)
    NR = tla.right_null(psi.ARs[x1], 1)       # (nr, p, vr)
    Y = tensordot(NL.conj(), R, axes=([0, 1], [0, 1]))   # (nl, p1, vr)
    M = tensordot(Y, NR.conj(), axes=([1, 2], [1, 2]))   # (nl, nr)
    if not M.blocks:
        return None
    U, _ss, Vh, _bond, _err = tla.svd_truncate(M, 1, trunc)
    if not U.blocks:
        return None
    dAL = tensordot(NL, U, axes=([2], [0]))    # (vl, p, k)
    dAR = tensordot(Vh, NR, axes=([1], [0]))   # (k, p, vr)
    return dAL, dAR


def expand_bonds(psi: UniformMPS, H: MPOHamiltonian, envs: Environments,
                 trunc: tla.Truncation) -> UniformMPS:
    """Grow every bond by its dominant two-site residual directions.  All
    expansion vectors are computed from the same state snapshot, then applied
    as one batch of direct sums + zero pads (the state itself is unchanged)."""
    T = psi.T
    deltas: Dict[int, Tuple[SymTensor, SymTensor]] = {}
    for x in range(T):
        d = _expansion_vectors(psi, H, envs, x, trunc)
        if d is not None:
            deltas[x] = d
    if not deltas:
        return psi

    ALs = list(psi.ALs)
    ARs = list(psi.ARs)
    Cs = list(psi.Cs)
    # step 1: append the new states at their own bond
    for x, (dAL, dAR) in deltas.items():
        x1 = (x + 1) % T
        ALs[x] = tla.concat_leg(ALs[x], dAL, 2)
        ARs[x1] = tla.concat_leg(ARs[x1], dAR, 0)
    # step 2: zero-pad the other legs touching each expanded bond
    for x in deltas:
        x1 = (x + 1) % T
        vAL_new = ALs[x].spaces[2]
        vAR_new = ARs[x1].spaces[0]
        ALs[x1] = tla.pad_leg(ALs[x1], 0, vAL_new)
        ARs[x] = tla.pad_leg(ARs[x], 2, vAR_new)
        Cs[x] = tla.pad_leg(tla.pad_leg(Cs[x], 0, vAL_new), 1, vAR_new)
    return UniformMPS(ALs, ARs, Cs)


def svd_cut(psi: UniformMPS, trunc: tla.Truncation) -> UniformMPS:
    """Truncate every bond by the Schmidt spectrum of its C matrix
    (reference SvdCut, :1016,1363-1365), then re-gauge."""
    T = psi.T
    projL: List[SymTensor] = []
    for x in range(T):
        U, _ss, _Vh, _bond, _err = tla.svd_truncate(psi.Cs[x], 1, trunc)
        projL.append(U)                  # (vAL at bond x, k)
    new_As = []
    for x in range(T):
        A = psi.ALs[x]
        UL = projL[(x - 1) % T]
        A = tensordot(UL.conj(), A, axes=([0], [0]))     # (k_{x-1}, p, vr)
        A = tensordot(A, projL[x], axes=([2], [0]))      # (k_{x-1}, p, k_x)
        new_As.append(A)
    return mixed_gauge(new_As)
