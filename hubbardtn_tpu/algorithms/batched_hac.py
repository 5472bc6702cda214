"""Shape-bucketed, batched effective-Hamiltonian matvec.

The block-sparse H_AC application issues one small GEMM chain per
(FSM transition, sector-block) pair — at chi~2048 that is O(10^3) tiny MXU
ops whose fixed launch cost (~2-3 ms total) dwarfs the useful FLOPs
(<1 TFLOP/s observed).  This module removes the op-count floor the
TPU-native way while keeping padding waste bounded:

* every sector dimension is rounded up to a power-of-two *bucket*;
* blocks of equal bucketed shape are stacked into one array;
* each contraction stage becomes one batched einsum per (shape-class pair)
  driven by static gather plans, with segment-sums accumulating outputs.

That turns ~1500 tiny ops into a few dozen large batched GEMMs with <= 2x
padding overhead.  Pads are zero, so results are exact (validated against
apply_H_AC).

Operands come channel-packed (mpo/channel_pack.py): GL3 (bra IN, ket OUT,
ch IN), W4 (ch OUT, p OUT, p IN, ch IN), GR3 (ket IN, bra OUT, ch OUT),
AC (vl IN, p OUT, vr OUT); physical sectors are 1-dimensional, so every
stage is a genuine matrix-matrix batch with a small channel axis riding
along.

Layout contract: the Krylov vector is the concatenation of the bucketed
AC stacks (pads zero); pack/unpack are static reshapes, so Lanczos/GMRES
run unchanged on it.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mpo.channel_pack import PackedMPO
from ..tensor.symtensor import SymTensor


def _bucket(d: int) -> int:
    b = 8
    while b < d:
        b *= 2
    return b


class _Stacks:
    """Blocks grouped by bucketed shape: class key -> stacked array; plus a
    per-block (class, index, true-shape) map.  ``fixed_axes`` maps axis
    index -> fixed padded size (used for the small channel axis, which is
    padded to the global channel max instead of a pow2 bucket)."""

    def __init__(self, keys, dims, dtype, fixed_axes: Dict[int, int] = None,
                 exact_axes=()):
        self.dtype = dtype
        fixed_axes = fixed_axes or {}
        exact_axes = frozenset(exact_axes)
        self.classes: Dict[Tuple[int, ...], List] = defaultdict(list)
        self.pos: Dict = {}
        self.dims = dict(zip(keys, dims))
        for k, d in zip(keys, dims):
            ck = tuple(fixed_axes.get(i, None)
                       or (x if i in exact_axes else _bucket(x))
                       for i, x in enumerate(d))
            self.pos[k] = (ck, len(self.classes[ck]))
            self.classes[ck].append(k)
        self.class_keys = sorted(self.classes.keys())

    def zeros(self):
        return {ck: jnp.zeros((len(self.classes[ck]),) + ck,
                              dtype=self.dtype)
                for ck in self.class_keys}

    def fill(self, stacks, blocks):
        import jax as _jax
        eager = not any(isinstance(b, _jax.core.Tracer)
                        for b in blocks.values())
        if eager:
            # host-side assembly: one transfer per class instead of one
            # device scatter RPC per block
            bufs = {ck: np.zeros(stacks[ck].shape,
                                 dtype=stacks[ck].dtype)
                    for ck in stacks}
            for k, b in blocks.items():
                if k not in self.pos:
                    continue
                ck, i = self.pos[k]
                arr = np.asarray(b)
                sl = (i,) + tuple(slice(0, s) for s in arr.shape)
                bufs[ck][sl] = arr
            return {ck: jnp.asarray(v) for ck, v in bufs.items()}
        for k, b in blocks.items():
            if k not in self.pos:
                continue
            ck, i = self.pos[k]
            sl = (i,) + tuple(slice(0, s) for s in b.shape)
            stacks[ck] = stacks[ck].at[sl].set(b.astype(self.dtype))
        return stacks


class PaddedHAC:
    """Static bucketed plan for one site's batched H_AC matvec.

    Physical sectors may carry any multiplicity (the grand-canonical site
    has a 2-dim trivial sector, reference SymSpace() at
    /root/reference/src/HubbardFunctions.jl:341-346): the physical axis
    rides every stage as an exact (non-bucketed) class axis, so AC stacks
    are (n, Dl, P, Dr) and W stacks (n, C, Po, Pi, C)."""

    def __init__(self, GL3: SymTensor, W4: SymTensor, GR3: SymTensor,
                 AC: SymTensor, Cch: int = None):
        self.dtype = AC.dtype
        Vl, Pp, Vr = AC.spaces

        # Cch overrides the channel-axis pad (e.g. the env engine's global
        # max, so its stacked envs feed this plan with no relayout)
        C = Cch or max(max((d for _, d in W4.spaces[0]), default=1),
                       max((d for _, d in W4.spaces[3]), default=1))
        self.C = C

        ac_keys = sorted(AC.allowed_keys())
        ac_dims = [(Vl.dim_of(k[0]), Pp.dim_of(k[1]), Vr.dim_of(k[2]))
                   for k in ac_keys]
        self.ac = _Stacks(ac_keys, ac_dims, self.dtype, exact_axes={1})

        gl_keys = sorted(GL3.allowed_keys())
        gl_dims = [tuple(GL3.spaces[i].dim_of(k[i]) for i in range(3))
                   for k in gl_keys]
        self.gl = _Stacks(gl_keys, gl_dims, self.dtype, fixed_axes={2: C})

        gr_keys = sorted(GR3.allowed_keys())
        gr_dims = [tuple(GR3.spaces[i].dim_of(k[i]) for i in range(3))
                   for k in gr_keys]
        self.gr = _Stacks(gr_keys, gr_dims, self.dtype, fixed_axes={2: C})

        w_keys = sorted(W4.blocks.keys())
        for k in w_keys:
            if (np.iscomplexobj(np.asarray(W4.blocks[k]))
                    and jnp.dtype(self.dtype).kind != "c"):
                raise TypeError(
                    "complex MPO block with a real state dtype: promote the "
                    "MPS to complex before using the batched H_AC path")
        w_dims = [tuple(W4.spaces[i].dim_of(k[i]) for i in range(4))
                  for k in w_keys]
        self.w = _Stacks(w_keys, w_dims, self.dtype,
                         fixed_axes={0: C, 3: C}, exact_axes={1, 2})
        self.Wp = self.w.fill(self.w.zeros(), W4.blocks)
        # W values are captured constants of the jitted matvec; they MUST be
        # part of the static signature or jit's cache would serve a kernel
        # compiled for a different Hamiltonian with the same block structure
        import hashlib
        h = hashlib.sha1()
        for ck in self.w.class_keys:
            h.update(np.ascontiguousarray(np.asarray(self.Wp[ck])).tobytes())
        self._wsig = (tuple(w_keys), h.hexdigest())

        # ---- stage 1: Y1[(b, qa, pi, r)] = GL[(b,k,qa)] . AC[(k,pi,r)] ----
        # Y1 classes keyed (gl bucket d0, C, P exact, ac bucket dr)
        o1_pos: Dict = {}
        o1_counts: Dict[Tuple, int] = defaultdict(int)
        combos1 = []
        for gk in gl_keys:
            b, kq, qa = gk
            for ak in ac_keys:
                if ak[0] != kq:
                    continue
                o1 = (b, qa, ak[1], ak[2])
                gck, gi = self.gl.pos[gk]
                ack, ai = self.ac.pos[ak]
                yck = (gck[0], C, ack[1], ack[2])
                o1_pos[o1] = (yck, o1_counts[yck])
                o1_counts[yck] += 1
                combos1.append(((gck, ack, yck),
                                (gi, ai, o1_pos[o1][1])))
        self.plan1 = self._group(combos1)
        self.y1_shape = dict(o1_counts)

        # ---- stage 2: Y2[(b, po, qb, r)] += Y1 . W ------------------------
        w_pos = self.w.pos
        o2_pos: Dict = {}
        o2_counts: Dict[Tuple, int] = defaultdict(int)
        combos2 = []
        for o1, (yck, yi) in o1_pos.items():
            b, qa, pi, r = o1
            for wk in w_keys:
                if wk[0] != qa or wk[2] != pi:
                    continue
                wck, wi = w_pos[wk]
                o2 = (b, wk[1], wk[3], r)
                zck = (yck[0], wck[1], C, yck[3])
                if o2 not in o2_pos:
                    o2_pos[o2] = (zck, o2_counts[zck])
                    o2_counts[zck] += 1
                zck2, zi = o2_pos[o2]
                assert zck2 == zck, "stage-2 class mismatch"
                combos2.append(((yck, wck, zck), (yi, wi, zi)))
        self.plan2 = self._group(combos2)
        self.y2_shape = dict(o2_counts)

        # ---- stage 3: out[(b, po, br)] += Y2[(b,po,qb,r)] . GR[(r,br,qb)] --
        combos3 = []
        for o2, (zck, zi) in o2_pos.items():
            b, po, qb, r = o2
            for gk in gr_keys:
                if gk[0] != r or gk[2] != qb:
                    continue
                ok = (b, po, gk[1])
                if ok not in self.ac.pos:
                    continue
                ock, oi = self.ac.pos[ok]
                rck, ri = self.gr.pos[gk]
                combos3.append(((zck, rck, ock), (zi, ri, oi)))
        self.plan3 = self._group(combos3)

        # vector layout
        self.vec_slices = {}
        off = 0
        for ck in self.ac.class_keys:
            n = len(self.ac.classes[ck])
            sz = n * int(np.prod(ck))
            self.vec_slices[ck] = (off, n)
            off += sz
        self.total = off

    @staticmethod
    def _group(combos):
        """Group (class-key-tuple, gather-index-tuple) pairs by class key."""
        plan = defaultdict(list)
        for ckey, idx in combos:
            plan[ckey].append(idx)
        return {k: tuple(jnp.asarray(col, dtype=jnp.int32)
                         for col in zip(*rows))
                for k, rows in plan.items()}

    # -- hashability ------------------------------------------------------
    def _sig(self):
        return (tuple(self.ac.pos.items()), tuple(self.gl.pos.items()),
                tuple(self.gr.pos.items()), self.C, str(self.dtype),
                self._wsig)

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, PaddedHAC) and self._sig() == other._sig()

    # -- packing ----------------------------------------------------------
    def pack_vec(self, AC: SymTensor) -> jnp.ndarray:
        stacks = self.ac.fill(self.ac.zeros(), AC.blocks)
        parts = [stacks[ck].reshape(-1) for ck in self.ac.class_keys]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unpack_vec(self, vec: jnp.ndarray, template: SymTensor) -> SymTensor:
        blocks = {}
        off = 0
        for ck in self.ac.class_keys:
            n = len(self.ac.classes[ck])
            sz = n * int(np.prod(ck))
            arr = vec[off:off + sz].reshape((n,) + ck)
            off += sz
            for i, k in enumerate(self.ac.classes[ck]):
                dl, dp, dr = self.ac.dims[k]
                blocks[k] = arr[i, :dl, :dp, :dr]
        return type(template)(template.group, template.spaces,
                              template.arrows, blocks, template.charge,
                              self.dtype)

    def pack_gl(self, GL3: SymTensor):
        return self.gl.fill(self.gl.zeros(), GL3.blocks)

    def pack_gr(self, GR3: SymTensor):
        return self.gr.fill(self.gr.zeros(), GR3.blocks)

    # -- matvec -----------------------------------------------------------
    def matvec(self, vec: jnp.ndarray, GLp, GRp) -> jnp.ndarray:
        ACs = {}
        off = 0
        for ck in self.ac.class_keys:
            n = len(self.ac.classes[ck])
            sz = n * int(np.prod(ck))
            ACs[ck] = vec[off:off + sz].reshape((n,) + ck)
            off += sz

        Y1 = {ck: jnp.zeros((n,) + ck, dtype=self.dtype)
              for ck, n in self.y1_shape.items()}
        for (gck, ack, yck), (gi, ai, yi) in self.plan1.items():
            gl = GLp[gck][gi]
            ac = ACs[ack][ai]
            contrib = jnp.einsum("bikc,bkpr->bicpr", gl, ac)
            Y1[yck] = Y1[yck].at[yi].add(contrib)

        Y2 = {ck: jnp.zeros((n,) + ck, dtype=self.dtype)
              for ck, n in self.y2_shape.items()}
        for (yck, wck, zck), (yi, wi, zi) in self.plan2.items():
            y1 = Y1[yck][yi]                  # (m, Dl, C, Pi, Dr)
            w = self.Wp[wck][wi]              # (m, C, Po, Pi, C)
            contrib = jnp.einsum("bicpr,bcqpd->biqdr", y1, w)
            Y2[zck] = Y2[zck].at[zi].add(contrib)

        OUT = {ck: jnp.zeros((len(self.ac.classes[ck]),) + ck,
                             dtype=self.dtype)
               for ck in self.ac.class_keys}
        for (zck, rck, ock), (zi, ri, oi) in self.plan3.items():
            y2 = Y2[zck][zi]                  # (m, Dl, Po, C, Dr)
            gr = GRp[rck][ri]                 # (m, Dr, Br, C)
            contrib = jnp.einsum("biqdr,brsd->biqs", y2, gr)
            contrib = contrib[:, :ock[0], :, :ock[2]]
            OUT[ock] = OUT[ock].at[oi].add(contrib)

        return jnp.concatenate(
            [OUT[ck].reshape(-1) for ck in self.ac.class_keys])


class PaddedHC:
    """Bucketed batched zero-site effective Hamiltonian:
    out[(b, br)] = sum_qa GL1[(b, k, qa)] C[(k, r)] GR[(r, br, qa)]."""

    def __init__(self, GL3: SymTensor, GR3: SymTensor, C: SymTensor,
                 Cch: int = None):
        self.dtype = C.dtype
        C_keys = sorted(C.allowed_keys())
        C_dims = [(C.spaces[0].dim_of(k[0]), C.spaces[1].dim_of(k[1]))
                  for k in C_keys]
        self.c = _Stacks(C_keys, C_dims, self.dtype)

        Cch = Cch or max(max((d for _, d in GL3.spaces[2]), default=1),
                         max((d for _, d in GR3.spaces[2]), default=1))
        self.C = Cch
        gl_keys = sorted(GL3.allowed_keys())
        gl_dims = [tuple(GL3.spaces[i].dim_of(k[i]) for i in range(3))
                   for k in gl_keys]
        self.gl = _Stacks(gl_keys, gl_dims, self.dtype, fixed_axes={2: Cch})
        gr_keys = sorted(GR3.allowed_keys())
        gr_dims = [tuple(GR3.spaces[i].dim_of(k[i]) for i in range(3))
                   for k in gr_keys]
        self.gr = _Stacks(gr_keys, gr_dims, self.dtype, fixed_axes={2: Cch})

        # stage 1: Y[(b, qa, r)] = GL[(b,k,qa)] . C[(k,r)]
        o1_pos: Dict = {}
        o1_counts: Dict[Tuple, int] = defaultdict(int)
        combos1 = []
        for gk in gl_keys:
            b, kq, qa = gk
            for ck in C_keys:
                if ck[0] != kq:
                    continue
                gck, gi = self.gl.pos[gk]
                cck, ci = self.c.pos[ck]
                yck = (gck[0], Cch, cck[1])
                o1 = (b, qa, ck[1])
                o1_pos[o1] = (yck, o1_counts[yck])
                o1_counts[yck] += 1
                combos1.append(((gck, cck, yck), (gi, ci, o1_pos[o1][1])))
        self.plan1 = PaddedHAC._group(combos1)
        self.y1_shape = dict(o1_counts)

        # stage 2: out[(b, br)] += Y[(b, qa, r)] . GR[(r, br, qa)]
        combos2 = []
        for o1, (yck, yi) in o1_pos.items():
            b, qa, r = o1
            for gk in gr_keys:
                if gk[0] != r or gk[2] != qa:
                    continue
                ok = (b, gk[1])
                if ok not in self.c.pos:
                    continue
                ock, oi = self.c.pos[ok]
                rck, ri = self.gr.pos[gk]
                combos2.append(((yck, rck, ock), (yi, ri, oi)))
        self.plan2 = PaddedHAC._group(combos2)

        self.total = sum(len(self.c.classes[ck]) * ck[0] * ck[1]
                         for ck in self.c.class_keys)

    def _sig(self):
        return (tuple(self.c.pos.items()), tuple(self.gl.pos.items()),
                tuple(self.gr.pos.items()), self.C, str(self.dtype))

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, PaddedHC) and self._sig() == other._sig()

    def pack_vec(self, C: SymTensor) -> jnp.ndarray:
        stacks = self.c.fill(self.c.zeros(), C.blocks)
        parts = [stacks[ck].reshape(-1) for ck in self.c.class_keys]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unpack_vec(self, vec: jnp.ndarray, template: SymTensor) -> SymTensor:
        blocks = {}
        off = 0
        for ck in self.c.class_keys:
            n = len(self.c.classes[ck])
            sz = n * ck[0] * ck[1]
            arr = vec[off:off + sz].reshape((n,) + ck)
            off += sz
            for i, k in enumerate(self.c.classes[ck]):
                dl, dr = self.c.dims[k]
                blocks[k] = arr[i, :dl, :dr]
        return type(template)(template.group, template.spaces,
                              template.arrows, blocks, template.charge,
                              self.dtype)

    def pack_gl(self, GL3: SymTensor):
        return self.gl.fill(self.gl.zeros(), GL3.blocks)

    def pack_gr(self, GR3: SymTensor):
        return self.gr.fill(self.gr.zeros(), GR3.blocks)

    def matvec(self, vec: jnp.ndarray, GLp, GRp) -> jnp.ndarray:
        Cs = {}
        off = 0
        for ck in self.c.class_keys:
            n = len(self.c.classes[ck])
            sz = n * ck[0] * ck[1]
            Cs[ck] = vec[off:off + sz].reshape((n,) + ck)
            off += sz
        Y1 = {ck: jnp.zeros((n,) + ck, dtype=self.dtype)
              for ck, n in self.y1_shape.items()}
        for (gck, cck, yck), (gi, ci, yi) in self.plan1.items():
            contrib = jnp.einsum("bijc,bjr->bicr", GLp[gck][gi], Cs[cck][ci])
            Y1[yck] = Y1[yck].at[yi].add(contrib)
        OUT = {ck: jnp.zeros((len(self.c.classes[ck]),) + ck,
                             dtype=self.dtype)
               for ck in self.c.class_keys}
        for (yck, rck, ock), (yi, ri, oi) in self.plan2.items():
            contrib = jnp.einsum("bicr,brsc->bis", Y1[yck][yi], GRp[rck][ri])
            contrib = contrib[:, :ock[0], :ock[1]]
            OUT[ock] = OUT[ock].at[oi].add(contrib)
        return jnp.concatenate(
            [OUT[ck].reshape(-1) for ck in self.c.class_keys])


def build_padded_hac(H, GL: Dict[int, SymTensor], GR: Dict[int, SymTensor],
                     AC: SymTensor, site_index: int = 0):
    """Convenience: channel-pack + plan + pack all operands for one site."""
    pm = PackedMPO(H)
    T = H.T
    GL3 = pm.pack_env_left(GL, site_index)
    GR3 = pm.pack_env_right(GR, (site_index + 1) % T)
    plan = PaddedHAC(GL3, pm.Ws[site_index], GR3, AC)
    return plan, plan.pack_vec(AC), plan.pack_gl(GL3), plan.pack_gr(GR3)
