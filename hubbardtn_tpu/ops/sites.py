"""Local site algebras for Hubbard models.

TPU-native equivalent of the reference's local-operator constructors
(/root/reference/src/HubbardFunctions.jl:245-382).  Two site types:

* ``canonical_site(P, Q)``: fixed-filling site with symmetry
  fZ2 x U1(2Sz) x U1(Q*n - P).  Mirrors ``SymSpace(P,Q,spin)`` (:245-255);
  the reference's SU(2) variant (spin=false) is represented through its
  U(1) Sz subgroup — same physics, abelian blocks.
* ``grand_site()``: grand-canonical site with symmetry fZ2 x U1(2Sz) and a
  2-dimensional trivial sector {|0>, |up,down>}.  Mirrors ``SymSpace()``
  (:341-346).

Basis and fermion conventions (|up,down> := c†_up c†_dn |0>):
  c_up:  |up> -> |0>,  |up,down> -> |down>
  c_dn:  |down> -> |0>, |up,down> -> -|up>
  Z = (-1)^n = diag(1,-1,-1,1)  (Jordan-Wigner string operator)

All operators are 2-leg SymTensors with legs (p OUT, p IN) and the operator's
charge stored on the tensor, so MPO virtual legs can carry the flow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np

from ..symmetry.groups import FERMION_SPIN, FERMION_SPIN_CHARGE, AbelianGroup, Sector
from ..symmetry.spaces import Space
from ..tensor.symtensor import IN, OUT, SymTensor


@dataclass(frozen=True)
class Site:
    """A local Hilbert space with its operator algebra.

    ops maps name -> (operator SymTensor, fermionic parity in {0,1}).
    """

    group: AbelianGroup
    space: Space
    ops: Dict[str, Tuple[SymTensor, int]] = field(hash=False)

    def op(self, name: str) -> SymTensor:
        return self.ops[name][0]

    def parity(self, name: str) -> int:
        return self.ops[name][1]


def _op_from_dense(group, space, dense, tol=1e-14) -> SymTensor:
    """Build a charged 2-leg operator from its dense matrix, inferring charge."""
    dense = np.asarray(dense, dtype=np.float64)
    offs = space.offsets()
    charge = None
    for q_out, d_out in space:
        for q_in, d_in in space:
            blk = dense[offs[q_out]:offs[q_out] + d_out, offs[q_in]:offs[q_in] + d_in]
            if np.max(np.abs(blk)) > tol:
                c = group.fuse(q_out, group.dual(q_in))
                if charge is None:
                    charge = c
                elif charge != c:
                    raise ValueError("operator is not charge-homogeneous")
    if charge is None:
        charge = group.trivial
    return SymTensor.from_dense(group, (space, space), (OUT, IN), dense, charge=charge)


def _build_ops(group, space, order):
    """Dense 4x4 fermion algebra in basis order |0>, |up>, |down>, |updown>,
    then permuted to the sector layout given by ``order`` (tuple of basis
    indices in the order the sectors enumerate them)."""
    cu = np.zeros((4, 4))
    cu[0, 1] = 1.0   # c_up |up> = |0>
    cu[2, 3] = 1.0   # c_up |updown> = |down>
    cd = np.zeros((4, 4))
    cd[0, 2] = 1.0   # c_dn |down> = |0>
    cd[1, 3] = -1.0  # c_dn |updown> = -|up>
    cu_dag, cd_dag = cu.T, cd.T
    nup = cu_dag @ cu
    ndn = cd_dag @ cd
    n = nup + ndn
    docc = nup @ ndn
    sz = 0.5 * (nup - ndn)
    Z = np.diag([1.0, -1.0, -1.0, 1.0])
    ident = np.eye(4)

    P = np.zeros((4, 4))
    for new, old in enumerate(order):
        P[new, old] = 1.0

    def mk(mat, parity):
        return _op_from_dense(group, space, P @ mat @ P.T), parity

    return {
        "id": mk(ident, 0),
        "Z": mk(Z, 0),
        "cu+": mk(cu_dag, 1),
        "cu": mk(cu, 1),
        "cd+": mk(cd_dag, 1),
        "cd": mk(cd, 1),
        "n": mk(n, 0),
        "nup": mk(nup, 0),
        "ndn": mk(ndn, 0),
        "docc": mk(docc, 0),
        "sz": mk(sz, 0),
    }


def canonical_site(P: int, Q: int) -> Site:
    """Fixed-filling site.  Sector charges: (parity, 2*Sz, Q*n - P); the charge
    shift makes a filling-P/Q state charge-neutral per unit cell (reference
    space at src/HubbardFunctions.jl:248,251)."""
    g = FERMION_SPIN_CHARGE
    sec0 = (0, 0, -P)          # |0>
    secu = (1, 1, Q - P)       # |up>
    secd = (1, -1, Q - P)      # |down>
    sec2 = (0, 0, 2 * Q - P)   # |updown>
    space = Space(g, {sec0: 1, secu: 1, secd: 1, sec2: 1})
    # sector sort order determines the dense layout; compute the permutation
    secs = [sec0, secu, secd, sec2]
    order = [secs.index(s) for s in space.sectors]
    ops = _build_ops(g, space, order)
    return Site(g, space, ops)


def grand_site() -> Site:
    """Grand-canonical site: fZ2 x U1(2Sz), trivial sector is 2-dimensional
    {|0>, |updown>} (reference space at src/HubbardFunctions.jl:341-346)."""
    g = FERMION_SPIN
    sec0 = (0, 0)
    secu = (1, 1)
    secd = (1, -1)
    space = Space(g, {sec0: 2, secu: 1, secd: 1})
    # dense layout: sorted sectors -> (0,0):{|0>,|updown>}, (1,-1):{|down>}, (1,1):{|up>}
    # basis indices in |0>,|up>,|down>,|updown> numbering:
    sector_layout = {sec0: [0, 3], secd: [2], secu: [1]}
    order = []
    for s in space.sectors:
        order.extend(sector_layout[s])
    ops = _build_ops(g, space, order)
    return Site(g, space, ops)
