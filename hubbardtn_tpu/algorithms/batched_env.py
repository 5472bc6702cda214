"""Bucketed batched MPS transfer operators for the environment solves.

The environment fixed-point GMRES applies the cell transfer operator
``X -> sum_p A^dag X A`` 30+ times per restart; on the per-block dict path
that is thousands of tiny GEMMs per solve (the largest stage of the
chi~2752 iteration, bench.py).  Here the transfer is compiled to the same
shape-bucketed batched form as the H_AC matvec (algorithms/batched_hac.py):

* X blocks (one square block per bond sector) stack into pow2 classes;
* A blocks stack by (bucket vl, exact p, bucket vr) — identical bucket
  sizes mean the X ket axis always matches the A vl axis class-for-class;
* each site transfer is two batched einsums with static gather plans;
* the regularization term ``+ (Y . rho) I0 / tr`` is a flat dot against a
  transpose-packed rho vector (pads are zero on both sides, so it's exact).

``RegLeftPackedPlan`` / ``RegRightPackedPlan`` expose the hashable
``matvec(v, *ops)`` interface of ``solvers/krylov.gmres_plan``, so the
whole GMRES restart jits into one program of large batched GEMMs.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mps.imps import UniformMPS
from ..symmetry.spaces import Space
from ..tensor.symtensor import SymTensor


def _bucket(d: int) -> int:
    b = 8
    while b < d:
        b *= 2
    return b


class XLayout:
    """Bucketed stack layout for a neutral 2-leg bond operator
    (square block per sector)."""

    def __init__(self, V: Space, dtype):
        self.V = V
        self.dtype = dtype
        self.classes: Dict[int, List] = defaultdict(list)
        self.pos: Dict = {}
        self.dims: Dict = {}
        for q, d in V.items:
            ck = _bucket(d)
            self.pos[q] = (ck, len(self.classes[ck]))
            self.classes[ck].append(q)
            self.dims[q] = d
        self.class_keys = sorted(self.classes.keys())
        self.sizes = {ck: len(self.classes[ck]) * ck * ck
                      for ck in self.class_keys}
        self.total = sum(self.sizes.values())

    def _sig(self):
        return (tuple(self.V.items), str(self.dtype))

    def pack(self, X: SymTensor) -> jnp.ndarray:
        """2-leg SymTensor (diag sector blocks, keys (q, q)) -> flat vec."""
        eager = not any(isinstance(b, jax.core.Tracer)
                        for b in X.blocks.values())
        if eager:
            # host numpy assembly: XLA CPU's eager scatter/concat family
            # has corrupted the heap before (see tensor/linalg.pad_leg)
            out = np.zeros((self.total,), dtype=jnp.dtype(self.dtype).name)
            off = 0
            for ck in self.class_keys:
                n = len(self.classes[ck])
                buf = np.zeros((n, ck, ck), dtype=out.dtype)
                for i, q in enumerate(self.classes[ck]):
                    b = X.blocks.get((q, q))
                    if b is not None:
                        arr = np.asarray(b)
                        buf[i, :arr.shape[0], :arr.shape[1]] = arr
                sz = n * ck * ck
                out[off:off + sz] = buf.reshape(-1)
                off += sz
            return jnp.asarray(out)
        parts = []
        for ck in self.class_keys:
            n = len(self.classes[ck])
            buf = jnp.zeros((n, ck, ck), dtype=self.dtype)
            for i, q in enumerate(self.classes[ck]):
                b = X.blocks.get((q, q))
                if b is not None:
                    buf = buf.at[i, :b.shape[0], :b.shape[1]].set(
                        b.astype(self.dtype))
            parts.append(buf.reshape(-1))
        if not parts:
            return jnp.zeros((0,), dtype=self.dtype)
        return jnp.concatenate(parts)

    def pack_transposed(self, X: SymTensor) -> jnp.ndarray:
        """Pack block-transposes: <pack(Y), pack_transposed(R)> (plain, no
        conjugation) equals the trace pairing tr(Y R)."""
        Xt = SymTensor(X.group, (X.spaces[1], X.spaces[0]),
                       (X.arrows[1], X.arrows[0]),
                       {(k[1], k[0]): jnp.swapaxes(b, 0, 1)
                        for k, b in X.blocks.items()}, X.charge, X.dtype)
        return self.pack(Xt)

    def unflatten(self, vec: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        out = {}
        off = 0
        for ck in self.class_keys:
            n = len(self.classes[ck])
            sz = n * ck * ck
            out[ck] = vec[off:off + sz].reshape((n, ck, ck))
            off += sz
        return out

    def flatten(self, stacks: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate([stacks[ck].reshape(-1)
                                for ck in self.class_keys])

    def unpack(self, vec: jnp.ndarray, template: SymTensor) -> SymTensor:
        stacks = self.unflatten(vec)
        blocks = {}
        for ck in self.class_keys:
            for i, q in enumerate(self.classes[ck]):
                d = self.dims[q]
                blocks[(q, q)] = stacks[ck][i, :d, :d]
        return SymTensor(template.group, template.spaces, template.arrows,
                         blocks, template.charge, self.dtype)


class ALayout:
    """Bucketed stack layout for one site tensor (vl, p, vr)."""

    def __init__(self, A: SymTensor):
        self.dtype = A.dtype
        Vl, Pp, Vr = A.spaces
        self.keys = sorted(A.allowed_keys())
        self.dims = {k: (Vl.dim_of(k[0]), Pp.dim_of(k[1]), Vr.dim_of(k[2]))
                     for k in self.keys}
        self.classes: Dict[Tuple[int, int, int], List] = defaultdict(list)
        self.pos: Dict = {}
        for k in self.keys:
            dl, dp, dr = self.dims[k]
            ck = (_bucket(dl), dp, _bucket(dr))
            self.pos[k] = (ck, len(self.classes[ck]))
            self.classes[ck].append(k)
        self.class_keys = sorted(self.classes.keys())

    def _sig(self):
        return (tuple(self.keys), tuple(sorted(self.dims.items())),
                str(self.dtype))

    def pack(self, A: SymTensor):
        eager = not any(isinstance(b, jax.core.Tracer)
                        for b in A.blocks.values())
        stacks = {}
        for ck in self.class_keys:
            n = len(self.classes[ck])
            if eager:
                buf = np.zeros((n,) + ck, dtype=jnp.dtype(self.dtype).name)
                for i, k in enumerate(self.classes[ck]):
                    b = A.blocks.get(k)
                    if b is not None:
                        arr = np.asarray(b)
                        buf[i, :arr.shape[0], :arr.shape[1],
                            :arr.shape[2]] = arr
                stacks[ck] = jnp.asarray(buf)
                continue
            buf = jnp.zeros((n,) + ck, dtype=self.dtype)
            for i, k in enumerate(self.classes[ck]):
                b = A.blocks.get(k)
                if b is not None:
                    buf = buf.at[i, :b.shape[0], :b.shape[1],
                                 :b.shape[2]].set(b.astype(self.dtype))
            stacks[ck] = buf
        return stacks


class SiteTransferPlan:
    """One-site bucketed transfer X(bond in) -> X'(bond out).

    left:  X' = sum_p A^dag X A   (X at the bond LEFT of the site)
    right: X' = sum_p A X A^dag   (X at the bond RIGHT of the site)
    """

    def __init__(self, xin: XLayout, al: ALayout, xout: XLayout,
                 left: bool = True):
        self.left = left
        self.xin, self.al, self.xout = xin, al, xout
        combos1 = []  # stage 1 gathers
        o1_pos: Dict = {}
        o1_counts: Dict[Tuple, int] = defaultdict(int)
        for k in al.keys:
            ql, p, qr = k
            q_in = ql if left else qr
            if q_in not in xin.pos:
                continue
            xck, xi = xin.pos[q_in]
            ack, ai = al.pos[k]
            if left:
                yck = (xck, ack[1], ack[2])       # (bra_l, p, ket_r)
            else:
                yck = (ack[0], ack[1], xck)       # (ket_l, p, bra_r)
            o1 = k
            o1_pos[o1] = (yck, o1_counts[yck])
            o1_counts[yck] += 1
            combos1.append(((xck, ack, yck), (xi, ai, o1_pos[o1][1])))
        self.plan1 = self._group(combos1)
        self.y1_shape = dict(o1_counts)

        combos2 = []  # stage 2: contract the conjugate A copy
        for k, (yck, yi) in o1_pos.items():
            ql, p, qr = k
            q_out = qr if left else ql
            if q_out not in xout.pos:
                continue
            ock, oi = xout.pos[q_out]
            ack, ai = al.pos[k]
            combos2.append(((yck, ack, ock), (yi, ai, oi)))
        self.plan2 = self._group(combos2)

    @staticmethod
    def _group(combos):
        plan = defaultdict(list)
        for ckey, idx in combos:
            plan[ckey].append(idx)
        return {k: tuple(jnp.asarray(col, dtype=jnp.int32)
                         for col in zip(*rows))
                for k, rows in plan.items()}

    def apply(self, xstacks, astacks):
        dtype = self.xin.dtype
        Y1 = {ck: jnp.zeros((n,) + ck, dtype=dtype)
              for ck, n in self.y1_shape.items()}
        for (xck, ack, yck), (xi, ai, yi) in self.plan1.items():
            x = xstacks[xck][xi]
            a = astacks[ack][ai]
            if self.left:
                # X (bra_l, ket_l) . A (ket_l=vl, p, vr)
                contrib = jnp.einsum("bij,bjpr->bipr", x, a)
            else:
                # A (vl, p, vr=ket_r) . X (ket_r, bra_r)
                contrib = jnp.einsum("bkpr,brs->bkps", a, x)
            Y1[yck] = Y1[yck].at[yi].add(contrib)
        OUT = {ck: jnp.zeros((len(self.xout.classes[ck]), ck, ck),
                             dtype=dtype) for ck in self.xout.class_keys}
        for (yck, ack, ock), (yi, ai, oi) in self.plan2.items():
            y = Y1[yck][yi]
            a = jnp.conj(astacks[ack][ai])
            if self.left:
                # conj(A) (bra_l, p, bra_r) . Y1 (bra_l, p, ket_r)
                contrib = jnp.einsum("bjps,bjpr->bsr", a, y)
            else:
                # Y1 (ket_l, p, bra_r) . conj(A) (bra_l, p, bra_r)
                contrib = jnp.einsum("bkps,bjps->bkj", y, a)
            contrib = contrib[:, :ock, :ock]
            OUT[ock] = OUT[ock].at[oi].add(contrib)
        return OUT


class RegLeftPackedPlan:
    """Regularized left fixed-point operator on bucketed stacks:
    v -> v - T_cell(v) + (v . rhoT) i0 / tr.

    ops for matvec: (astacks_per_site, rhoT_vec, i0_vec, tr)."""

    def __init__(self, psi, dtype=None):
        ALs = psi.ALs if hasattr(psi, "ALs") else list(psi)
        T = len(ALs)
        dtype = dtype or ALs[0].dtype
        self.xls = [XLayout(ALs[x].spaces[0], dtype) for x in range(T)]
        self.als = [ALayout(ALs[x]) for x in range(T)]
        # variable lives at the bond left of site 0 (= bond T-1)
        self.site_plans = [SiteTransferPlan(self.xls[x], self.als[x],
                                            self.xls[(x + 1) % T], left=True)
                           for x in range(T)]
        self.layout = self.xls[0]
        self._sig = ("regLpk", tuple(x._sig() for x in self.xls),
                     tuple(a._sig() for a in self.als))

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return (isinstance(other, type(self)) and self._sig == other._sig)

    def pack_As(self, psi):
        ALs = psi.ALs if hasattr(psi, "ALs") else list(psi)
        return [self.als[x].pack(ALs[x]) for x in range(len(ALs))]

    def matvec(self, v, astacks, rhoT_vec, i0_vec, tr):
        Y = self.layout.unflatten(v)
        for sp, a in zip(self.site_plans, astacks):
            Y = sp.apply(Y, a)
        ty = self.layout.flatten(Y)
        corr = jnp.sum(v * rhoT_vec) / tr
        return v - ty + corr * i0_vec


class RegRightPackedPlan:
    """Regularized right fixed-point operator (variable at the bond right
    of site T-1; the cell transfer sweeps right-to-left)."""

    def __init__(self, psi, dtype=None):
        ARs = psi.ARs if hasattr(psi, "ARs") else list(psi)
        T = len(ARs)
        dtype = dtype or ARs[0].dtype
        self.xrs = [XLayout(ARs[x].spaces[2], dtype) for x in range(T)]
        self.ars = [ALayout(ARs[x]) for x in range(T)]
        self.site_plans = [SiteTransferPlan(self.xrs[x], self.ars[x],
                                            self.xrs[(x - 1) % T],
                                            left=False)
                           for x in range(T)]
        self.layout = self.xrs[T - 1]
        self._sig = ("regRpk", tuple(x._sig() for x in self.xrs),
                     tuple(a._sig() for a in self.ars))

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return (isinstance(other, type(self)) and self._sig == other._sig)

    def pack_As(self, psi):
        ARs = psi.ARs if hasattr(psi, "ARs") else list(psi)
        return [self.ars[x].pack(ARs[x]) for x in range(len(ARs))]

    def matvec(self, v, astacks, sigT_vec, i0_vec, tr):
        Y = self.layout.unflatten(v)
        for x in reversed(range(len(self.site_plans))):
            Y = self.site_plans[x].apply(Y, astacks[x])
        ty = self.layout.flatten(Y)
        corr = jnp.sum(sigT_vec * v) / tr
        return v - ty + corr * i0_vec
