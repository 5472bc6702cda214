"""Class-batched MPO environment transfers (both backends).

The environment presweeps and interior fills were the last dict-path
stage of the chi~2752 iteration: each one-site MPO transfer
(environments.mpo_transfer_left/right) issues one small GEMM chain per
(channel transition, sector block) — measured on chip to be per-sector
data-movement-bound (0.59 TFLOP/s with the math provably free; the stage
cost is INDEPENDENT of the GMRES step count, PARITY.md "Latency
roofline").  This module compiles the full-MPO one-site transfer to the
same shape-bucketed batched form as the H_AC matvec
(algorithms/batched_hac.PaddedHAC) — stages 1-2 are literally the H_AC
plan's (env . A, then . W); stage 3 contracts the CONJUGATE MPS copy
instead of the opposite environment, producing the next bond's env
directly in the engine's stacked layout (batched_env_ab.EnvLayoutAb):

  left:   GL'[s,r,qb] = sum  conj(AL)[b,po,s] W[qa,po,pi,qb]
                             GL[b,k,qa] AL[k,pi,r]
  right:  GR'[l,m,qa] = sum  AR[l,pi,r] GR[r,s,qb]
                             W[qa,po,pi,qb] conj(AR)[m,po,s]

Channels ride the fixed channel axis (padded to the engine's global
Cch); channel multiplicities contract inside the batched einsums.  Pads
are zero on every operand, so results are block-exact vs the dict path
(tests/test_batched_env_ab.py) up to sum reassociation.

The dict path traded FLOPs for op count (XLA DCE prunes dead channel
chains the stacks must compute) — the right trade when the stage was
assumed compute-bound, the wrong one now that it is measured
latency-bound.  ``HTN_ENV_TRANSFER=dict`` restores the dict path.

The SU(2) variants (:class:`SU2TransferLeft`/`Right`) express the same
three stages as chained :class:`~.batched_fusion.FusionDotPlan`s over the
channel-stacked MPO (mpo/su2_pack.py) — stages 1-2 are literally
``PaddedHACSU2``'s plans with AL/AR as the ket copy; stage 3 contracts
the conjugate MPS copy with the transpose recoupling folded into its
scatter coefficients, landing directly in the engine's stacked env
layout.

Reference behavior: MPSKit ``environments`` transfer sweeps
(/root/reference/src/HubbardFunctions.jl:1017,1027,1205-1208).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor.symtensor import SymTensor
from .batched_env import ALayout
from .batched_hac import _Stacks


def _group(combos):
    plan = defaultdict(list)
    for ckey, idx in combos:
        plan[ckey].append(idx)
    return {k: tuple(jnp.asarray(col, dtype=jnp.int32)
                     for col in zip(*rows))
            for k, rows in plan.items()}


def _w_stacks(W4: SymTensor, C: int, dtype):
    """Channel-packed W blocks -> bucketed stacks (the PaddedHAC layout:
    channel axes fixed to the global pad, physical axes exact)."""
    w_keys = sorted(W4.blocks.keys())
    w_dims = [tuple(W4.spaces[i].dim_of(k[i]) for i in range(4))
              for k in w_keys]
    w = _Stacks(w_keys, w_dims, dtype, fixed_axes={0: C, 3: C},
                exact_axes={1, 2})
    Wp = w.fill(w.zeros(), W4.blocks)
    h = hashlib.sha1()
    for ck in w.class_keys:
        h.update(np.ascontiguousarray(np.asarray(Wp[ck])).tobytes())
    return w, Wp, (tuple(w_keys), h.hexdigest())


class PaddedTransferLeft:
    """One-site left-to-right env transfer on bucketed stacks:
    ``lay_in`` (bond left of the site) -> ``lay_out`` (bond right)."""

    def __init__(self, lay_in, W4: SymTensor, al: ALayout, lay_out):
        self.dtype = lay_in.dtype
        self.lay_out = lay_out
        C = lay_in.Cch
        assert lay_out.Cch == C
        self.w, self.Wp, self._wsig = _w_stacks(W4, C, self.dtype)

        # stage 1: Y1[(b, qa, pi, r)] = GL[(b,k,qa)] . AL[(k,pi,r)]
        # (identical structure to PaddedHAC stage 1 with AL as the ket)
        o1_pos: Dict = {}
        o1_counts: Dict[Tuple, int] = defaultdict(int)
        combos1 = []
        for gk in sorted(lay_in.stacks.pos):
            b, kq, qa = gk
            gck, gi = lay_in.stacks.pos[gk]
            for ak in al.keys:
                if ak[0] != kq:
                    continue
                ack, ai = al.pos[ak]
                o1 = (b, qa, ak[1], ak[2])
                yck = (gck[0], C, ack[1], ack[2])
                o1_pos[o1] = (yck, o1_counts[yck])
                o1_counts[yck] += 1
                combos1.append(((gck, ack, yck), (gi, ai, o1_pos[o1][1])))
        self.plan1 = _group(combos1)
        self.y1_shape = dict(o1_counts)

        # stage 2: Y2[(b, po, qb, r)] += Y1 . W   (PaddedHAC stage 2)
        o2_pos: Dict = {}
        o2_counts: Dict[Tuple, int] = defaultdict(int)
        combos2 = []
        for o1, (yck, yi) in o1_pos.items():
            b, qa, pi, r = o1
            for wk in self.w.pos:
                if wk[0] != qa or wk[2] != pi:
                    continue
                wck, wi = self.w.pos[wk]
                o2 = (b, wk[1], wk[3], r)
                zck = (yck[0], wck[1], C, yck[3])
                if o2 not in o2_pos:
                    o2_pos[o2] = (zck, o2_counts[zck])
                    o2_counts[zck] += 1
                zck2, zi = o2_pos[o2]
                assert zck2 == zck, "stage-2 class mismatch"
                combos2.append(((yck, wck, zck), (yi, wi, zi)))
        self.plan2 = _group(combos2)
        self.y2_shape = dict(o2_counts)

        # stage 3: out[(s, r, qb)] += conj(AL)[(b,po,s)] . Y2[(b,po,qb,r)]
        combos3 = []
        for o2, (zck, zi) in o2_pos.items():
            b, po, qb, r = o2
            for ak in al.keys:
                if ak[0] != b or ak[1] != po:
                    continue
                ok = (ak[2], r, qb)
                if ok not in lay_out.stacks.pos:
                    continue
                ack, ai = al.pos[ak]
                ock, oi = lay_out.stacks.pos[ok]
                assert ock == (ack[2], zck[3], C), "stage-3 class mismatch"
                combos3.append(((zck, ack, ock), (zi, ai, oi)))
        self.plan3 = _group(combos3)

    def apply(self, env_stacks, astack):
        dt = self.dtype
        Y1 = {ck: jnp.zeros((n,) + ck, dtype=dt)
              for ck, n in self.y1_shape.items()}
        for (gck, ack, yck), (gi, ai, yi) in self.plan1.items():
            gl = env_stacks[gck][gi]          # (m, Db, Dk, C)
            a = astack[ack][ai]               # (m, Dk, P, Dr)
            contrib = jnp.einsum("bikc,bkpr->bicpr", gl, a)
            Y1[yck] = Y1[yck].at[yi].add(contrib)
        Y2 = {ck: jnp.zeros((n,) + ck, dtype=dt)
              for ck, n in self.y2_shape.items()}
        for (yck, wck, zck), (yi, wi, zi) in self.plan2.items():
            y1 = Y1[yck][yi]                  # (m, Db, C, Pi, Dr)
            w = self.Wp[wck][wi]              # (m, C, Po, Pi, C)
            contrib = jnp.einsum("bicpr,bcqpd->biqdr", y1, w)
            Y2[zck] = Y2[zck].at[zi].add(contrib)
        OUT = self.lay_out.zeros()
        for (zck, ack, ock), (zi, ai, oi) in self.plan3.items():
            y2 = Y2[zck][zi]                  # (m, Db, Po, C, Dr)
            a = jnp.conj(astack[ack][ai])     # (m, Db, Po, Ds)
            contrib = jnp.einsum("biqdr,biqs->bsrd", y2, a)
            OUT[ock] = OUT[ock].at[oi].add(contrib)
        return OUT


class PaddedTransferRight:
    """One-site right-to-left env transfer on bucketed stacks:
    ``lay_in`` (bond right of the site) -> ``lay_out`` (bond left)."""

    def __init__(self, lay_in, W4: SymTensor, ar: ALayout, lay_out):
        self.dtype = lay_in.dtype
        self.lay_out = lay_out
        C = lay_in.Cch
        assert lay_out.Cch == C
        self.w, self.Wp, self._wsig = _w_stacks(W4, C, self.dtype)

        # stage 1: Y1[(l, pi, s, qb)] = AR[(l,pi,r)] . GR[(r,s,qb)]
        o1_pos: Dict = {}
        o1_counts: Dict[Tuple, int] = defaultdict(int)
        combos1 = []
        for ak in ar.keys:
            ack, ai = ar.pos[ak]
            for gk in sorted(lay_in.stacks.pos):
                if gk[0] != ak[2]:
                    continue
                gck, gi = lay_in.stacks.pos[gk]
                o1 = (ak[0], ak[1], gk[1], gk[2])
                yck = (ack[0], ack[1], gck[1], C)
                o1_pos[o1] = (yck, o1_counts[yck])
                o1_counts[yck] += 1
                combos1.append(((ack, gck, yck), (ai, gi, o1_pos[o1][1])))
        self.plan1 = _group(combos1)
        self.y1_shape = dict(o1_counts)

        # stage 2: Y2[(l, po, s, qa)] += Y1 . W  (contract pi and ch_b)
        o2_pos: Dict = {}
        o2_counts: Dict[Tuple, int] = defaultdict(int)
        combos2 = []
        for o1, (yck, yi) in o1_pos.items():
            l, pi, s, qb = o1
            for wk in self.w.pos:
                if wk[2] != pi or wk[3] != qb:
                    continue
                wck, wi = self.w.pos[wk]
                o2 = (l, wk[1], s, wk[0])
                zck = (yck[0], wck[1], yck[2], C)
                if o2 not in o2_pos:
                    o2_pos[o2] = (zck, o2_counts[zck])
                    o2_counts[zck] += 1
                zck2, zi = o2_pos[o2]
                assert zck2 == zck, "stage-2 class mismatch"
                combos2.append(((yck, wck, zck), (yi, wi, zi)))
        self.plan2 = _group(combos2)
        self.y2_shape = dict(o2_counts)

        # stage 3: out[(l, m, qa)] += Y2[(l,po,s,qa)] . conj(AR)[(m,po,s)]
        combos3 = []
        for o2, (zck, zi) in o2_pos.items():
            l, po, s, qa = o2
            for ak in ar.keys:
                if ak[1] != po or ak[2] != s:
                    continue
                ok = (l, ak[0], qa)
                if ok not in lay_out.stacks.pos:
                    continue
                ack, ai = ar.pos[ak]
                ock, oi = lay_out.stacks.pos[ok]
                assert ock == (zck[0], ack[0], C), "stage-3 class mismatch"
                combos3.append(((zck, ack, ock), (zi, ai, oi)))
        self.plan3 = _group(combos3)

    def apply(self, env_stacks, astack):
        dt = self.dtype
        Y1 = {ck: jnp.zeros((n,) + ck, dtype=dt)
              for ck, n in self.y1_shape.items()}
        for (ack, gck, yck), (ai, gi, yi) in self.plan1.items():
            a = astack[ack][ai]               # (m, Dl, P, Dr)
            gr = env_stacks[gck][gi]          # (m, Dr, Ds, C)
            contrib = jnp.einsum("blpr,brsc->blpsc", a, gr)
            Y1[yck] = Y1[yck].at[yi].add(contrib)
        Y2 = {ck: jnp.zeros((n,) + ck, dtype=dt)
              for ck, n in self.y2_shape.items()}
        for (yck, wck, zck), (yi, wi, zi) in self.plan2.items():
            y1 = Y1[yck][yi]                  # (m, Dl, Pi, Ds, C)
            w = self.Wp[wck][wi]              # (m, Ca, Po, Pi, Cb)
            contrib = jnp.einsum("blpsc,baqpc->blqsa", y1, w)
            Y2[zck] = Y2[zck].at[zi].add(contrib)
        OUT = self.lay_out.zeros()
        for (zck, ack, ock), (zi, ai, oi) in self.plan3.items():
            y2 = Y2[zck][zi]                  # (m, Dl, Po, Ds, Ca)
            a = jnp.conj(astack[ack][ai])     # (m, Dm, Po, Ds)
            contrib = jnp.einsum("blqsc,bmqs->blmc", y2, a)
            OUT[ock] = OUT[ock].at[oi].add(contrib)
        return OUT


# ----------------------------------------------------------------------
# SU(2) fusion-tree variants: the same three stages as chained
# FusionDotPlans (the dict path's exact contraction sequence,
# environments.mpo_transfer_left/right 4-leg branch)
# ----------------------------------------------------------------------

def _su2_w_stacks(W4, C: int, dtype):
    from .batched_fusion import OperandStruct, build_stacks
    w_struct = OperandStruct.of(W4, use_allowed=False)
    w = build_stacks(w_struct, dtype, fixed_axes={0: C, 3: C},
                     exact_axes={1, 2})
    Wp = w.fill(w.zeros(), W4.blocks)
    return w_struct, w, Wp


class SU2TransferLeft:
    """One-site left-to-right env transfer on fusion-tree stacks.

    Dict path (mpo_transfer_left, 4-leg):
        Y1 = X . AL          over (ket | vl)          -> (bra, chA, p, k')
        Y2 = W . Y1          over ((chA,pI)|(chA,p))  -> (pO, chB, bra, k')
        out = (ALbar . Y2)^T(0,2,1) over ((vl,p)|(bra,pO)) -> (bra', k', chB)
    """

    def __init__(self, lay_in, W4, AL, lay_out, a_stacks, abar_stacks):
        from .batched_fusion import FusionDotPlan, OperandStruct
        g = AL.group
        self.dtype = lay_in.dtype
        al_struct = OperandStruct.of(AL, use_allowed=True)
        albar_struct = OperandStruct.of(AL.conj(), use_allowed=True)
        C = lay_in.Cch
        assert lay_out.Cch == C
        self._wstruct, self.w, self.Wp = _su2_w_stacks(W4, C, self.dtype)
        self.p1 = FusionDotPlan(lay_in.struct, al_struct, ([1], [0]),
                                lay_in.stacks, a_stacks)
        y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                           sorted(self.p1.out_stacks.pos.keys()))
        self.p2 = FusionDotPlan(self._wstruct, y1, ([0, 2], [1, 2]),
                                self.w, self.p1.out_stacks)
        y2 = OperandStruct(g, self.p2.out_spaces, self.p2.out_arrows,
                           sorted(self.p2.out_stacks.pos.keys()))
        self.p3 = FusionDotPlan(albar_struct, y2, ([0, 1], [2, 0]),
                                abar_stacks, self.p2.out_stacks,
                                out_stacks=lay_out.stacks,
                                out_perm=(0, 2, 1))

    def apply(self, env_arrays, a_arrays, abar_arrays):
        Y1 = self.p1.apply(env_arrays, a_arrays)
        Y2 = self.p2.apply(self.Wp, Y1)
        return self.p3.apply(abar_arrays, Y2)


class SU2TransferRight:
    """One-site right-to-left env transfer on fusion-tree stacks.

    Dict path (mpo_transfer_right, 4-leg):
        Y1 = AR . X          over (vr | ket)          -> (vl, p, bra, chB)
        Y2 = W . Y1          over ((chB,pI)|(chB,p))  -> (chA, pO, vl, bra)
        out = (Y2 . ARbar)^T(1,2,0) over ((pO,bra)|(p,vr)) -> (ket', bra', chA)
    """

    def __init__(self, lay_in, W4, AR, lay_out, a_stacks, abar_stacks):
        from .batched_fusion import FusionDotPlan, OperandStruct
        g = AR.group
        self.dtype = lay_in.dtype
        ar_struct = OperandStruct.of(AR, use_allowed=True)
        arbar_struct = OperandStruct.of(AR.conj(), use_allowed=True)
        C = lay_in.Cch
        assert lay_out.Cch == C
        self._wstruct, self.w, self.Wp = _su2_w_stacks(W4, C, self.dtype)
        self.p1 = FusionDotPlan(ar_struct, lay_in.struct, ([2], [0]),
                                a_stacks, lay_in.stacks)
        y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                           sorted(self.p1.out_stacks.pos.keys()))
        self.p2 = FusionDotPlan(self._wstruct, y1, ([3, 2], [3, 1]),
                                self.w, self.p1.out_stacks)
        y2 = OperandStruct(g, self.p2.out_spaces, self.p2.out_arrows,
                           sorted(self.p2.out_stacks.pos.keys()))
        self.p3 = FusionDotPlan(y2, arbar_struct, ([1, 3], [1, 2]),
                                self.p2.out_stacks, abar_stacks,
                                out_stacks=lay_out.stacks,
                                out_perm=(1, 2, 0))

    def apply(self, env_arrays, a_arrays, abar_arrays):
        Y1 = self.p1.apply(a_arrays, env_arrays)
        Y2 = self.p2.apply(self.Wp, Y1)
        return self.p3.apply(Y2, abar_arrays)
