"""Shape-bucketed, batched fusion-tree contractions (SU(2) backend).

The channel-stacked SU(2) effective Hamiltonian (mpo/su2_pack.py) is three
``fusion_tensordot`` calls, but each of those still loops (block-A, block-B)
pairs and issues one small GEMM plus a scalar-recoupling scatter per pair —
at real bond dimensions that is O(10^3) tiny MXU ops per matvec, the same
op-count floor the abelian backend hit before algorithms/batched_hac.py.

This module removes it the same TPU-native way, generalized to fusion-tree
block tables:

* every sector dimension rounds up to a power-of-two bucket (physical and
  channel axes stay exact/fixed, as in the abelian plans);
* blocks of equal bucketed shape stack into one array;
* a :class:`FusionDotPlan` precomputes, for one tensordot with *static*
  operand structures, (a) the unique (block-A, block-B) GEMM list per shape
  class — batched into one einsum each — and (b) the recoupling scatter:
  ``out[oi] += coeff * gemm[gi]`` with coefficients from the same cached
  ``_tdot_coeffs`` projections the dict path uses, so results are exact;
* plans chain: a plan's output stacks are the next plan's input stacks, so
  :class:`PaddedHACSU2` runs H_AC as three planned stages with no
  unpack/repack between them, and the final stage folds the output
  transpose recoupling into its scatter coefficients.

Reference parity: this is the non-abelian counterpart of the reference's
TensorKit/BlockTensorKit contraction backend for its DEFAULT symmetry
setting (fZ2 x SU2 x U1, /root/reference/src/HubbardFunctions.jl:245-255),
mapped onto the MXU instead of threaded BLAS.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor.fusion import (FusionTensor, _abelian_parts, _su2_part,
                             _tdot_coeffs, _transpose_coeffs)
from .batched_hac import _bucket, _Stacks

_LETTERS = "abcdefghijklmnopqrstuvwxy"  # z is the batch axis


class OperandStruct:
    """Static structure of one contraction operand: group, legs, and the
    block keys that participate.  FusionTensor-shaped, but also produced by
    a plan to describe its (padded) output stacks for chaining."""

    __slots__ = ("group", "spaces", "arrows", "keys")

    def __init__(self, group, spaces, arrows, keys):
        self.group = group
        self.spaces = tuple(spaces)
        self.arrows = tuple(arrows)
        self.keys = tuple(keys)

    @classmethod
    def of(cls, t: FusionTensor, use_allowed: bool) -> "OperandStruct":
        keys = t.allowed_keys() if use_allowed else t.blocks.keys()
        return cls(t.group, t.spaces, t.arrows, sorted(keys))

    def key_shape(self, bk) -> Tuple[int, ...]:
        return tuple(sp.dim_of(q) for sp, q in zip(self.spaces, bk[0]))

    @property
    def ndim(self) -> int:
        return len(self.spaces)


def _placed_stacks(dtype, placements: Dict, dims: Dict) -> _Stacks:
    """Build a _Stacks whose (class, slot) assignment is given explicitly
    (used for plan outputs, whose padded layout is inherited from the input
    classes rather than recomputed from true dims)."""
    s = _Stacks.__new__(_Stacks)
    s.dtype = dtype
    s.pos = dict(placements)
    s.dims = dict(dims)
    classes: Dict[Tuple[int, ...], List] = defaultdict(list)
    for k, (ck, i) in placements.items():
        while len(classes[ck]) <= i:
            classes[ck].append(None)
        classes[ck][i] = k
    s.classes = classes
    s.class_keys = sorted(classes.keys())
    return s


def build_stacks(struct: OperandStruct, dtype, fixed_axes=None,
                 exact_axes=()) -> _Stacks:
    dims = [struct.key_shape(k) for k in struct.keys]
    return _Stacks(list(struct.keys), dims, dtype, fixed_axes=fixed_axes,
                   exact_axes=exact_axes)


class FusionDotPlan:
    """Static bucketed plan for one ``fusion_tensordot(A, B, axes)``.

    ``a_stacks``/``b_stacks`` give the padded block layout of the operands
    (build with :func:`build_stacks`, or chain a previous plan's
    ``out_stacks``).  If ``out_perm`` is given, the output legs are permuted
    and the transpose recoupling is folded into the scatter coefficients;
    ``out_stacks`` then addresses blocks in the *permuted* layout (e.g. the
    Krylov vector's AC stacks), and output keys absent from it are dropped
    (the projection the packed Lanczos space applies anyway).
    """

    def __init__(self, A: OperandStruct, B: OperandStruct, axes,
                 a_stacks: _Stacks, b_stacks: _Stacks,
                 out_stacks: Optional[_Stacks] = None,
                 out_perm: Optional[Sequence[int]] = None):
        if isinstance(axes, int):
            axA = tuple(range(A.ndim - axes, A.ndim))
            axB = tuple(range(axes))
        else:
            axA, axB = tuple(axes[0]), tuple(axes[1])
        assert len(axA) == len(axB)
        g = A.group
        slot = g.su2_slot
        freeA = [i for i in range(A.ndim) if i not in axA]
        freeB = [j for j in range(B.ndim) if j not in axB]
        self.dtype = a_stacks.dtype
        self.a_stacks, self.b_stacks = a_stacks, b_stacks
        self._axA, self._axB = tuple(axA), tuple(axB)

        out_perm = tuple(out_perm) if out_perm is not None else None
        nout = len(freeA) + len(freeB)
        self.out_spaces = tuple([A.spaces[i] for i in freeA]
                                + [B.spaces[j] for j in freeB])
        self.out_arrows = tuple([A.arrows[i] for i in freeA]
                                + [B.arrows[j] for j in freeB])
        if out_perm is not None:
            assert sorted(out_perm) == list(range(nout))

        bmap: Dict[Tuple, List] = defaultdict(list)
        for kb in B.keys:
            sig = tuple(kb[0][j] for j in axB)
            bmap[sig].append(kb)

        # unique GEMM list per class pair + recoupling scatter rows
        gemm_rows: Dict[Tuple, List] = defaultdict(list)   # (ack,bck)->[(ai,bi)]
        gemm_index: Dict[Tuple, int] = {}                  # (ack,bck,ai,bi)->gi
        scat_rows: Dict[Tuple, List] = defaultdict(list)   # (ack,bck,ock)->[(gi,oi,coeff)]
        o_pos: Dict = {}
        o_counts: Dict[Tuple, int] = defaultdict(int)
        o_dims: Dict = {}
        own_out = out_stacks is None

        for ka in A.keys:
            legsA, cA, tA = ka
            if ka not in a_stacks.pos:
                continue
            sig = tuple(legsA[i] for i in axA)
            ack, ai = a_stacks.pos[ka]
            tjsA = tuple(q[slot] for q in legsA)
            for kb in bmap.get(sig, ()):
                legsB, cB, tB = kb
                if kb not in b_stacks.pos:
                    continue
                bck, bi = b_stacks.pos[kb]
                # padded sizes of contracted axes must agree
                for i, j in zip(axA, axB):
                    assert ack[i] == bck[j], (
                        "contracted-axis padding mismatch between operand "
                        f"stacks: {ack} vs {bck} on axes {i},{j}")
                tjsB = tuple(q[slot] for q in legsB)
                coeffs = _tdot_coeffs(tjsA, A.arrows, cA[slot], tA, axA,
                                      tjsB, B.arrows, cB[slot], tB, axB)
                if not coeffs:
                    continue
                kO = tuple(legsA[i] for i in freeA) + \
                    tuple(legsB[j] for j in freeB)
                tjsO = tuple(q[slot] for q in kO)
                flux_abelian = tuple(
                    fa.fuse(x, y) if fa.kind == "Z" else x + y
                    for fa, x, y in zip(
                        (f for i, f in enumerate(g.factors) if i != slot),
                        _abelian_parts(g, cA), _abelian_parts(g, cB)))

                pair = (ack, bck, ai, bi)
                gi = gemm_index.get(pair)
                if gi is None:
                    gi = len(gemm_rows[(ack, bck)])
                    gemm_index[pair] = gi
                    gemm_rows[(ack, bck)].append((ai, bi))

                # padded/true dims of the (pre-perm) output block
                o_ck_pre = tuple([ack[i] for i in freeA]
                                 + [bck[j] for j in freeB])
                o_dims_pre = tuple(
                    [a_stacks.dims[ka][i] for i in freeA]
                    + [b_stacks.dims[kb][j] for j in freeB])

                for tjc_out, t_out, coeff in coeffs:
                    c_out = []
                    it = iter(flux_abelian)
                    for i in range(len(g.factors)):
                        c_out.append(tjc_out if i == slot
                                     else next(it))
                    c_out = tuple(c_out)
                    if out_perm is None:
                        outs = ((kO, c_out, t_out, coeff),)
                    else:
                        nkO = tuple(kO[i] for i in out_perm)
                        outs = tuple(
                            (nkO, c_out, t2, coeff * c2)
                            for t2, c2 in _transpose_coeffs(
                                tjsO, self.out_arrows, tjc_out, t_out,
                                out_perm)
                            if abs(coeff * c2) >= 1e-14)
                    for okey_legs, oc, ot, ctot in outs:
                        okey = (okey_legs, oc, ot)
                        if own_out:
                            if okey not in o_pos:
                                ock = (o_ck_pre if out_perm is None else
                                       tuple(o_ck_pre[i] for i in out_perm))
                                o_pos[okey] = (ock, o_counts[ock])
                                o_counts[ock] += 1
                                o_dims[okey] = (
                                    o_dims_pre if out_perm is None else
                                    tuple(o_dims_pre[i] for i in out_perm))
                            ock, oi = o_pos[okey]
                        else:
                            if okey not in out_stacks.pos:
                                continue
                            ock, oi = out_stacks.pos[okey]
                            ock_mine = (o_ck_pre if out_perm is None else
                                        tuple(o_ck_pre[i] for i in out_perm))
                            if ock != ock_mine:
                                raise ValueError(
                                    "output-stack padding mismatch: plan "
                                    f"produces {ock_mine}, target {ock}")
                        scat_rows[(ack, bck, ock)].append((gi, oi, ctot))

        if own_out:
            out_stacks = _placed_stacks(self.dtype, o_pos, o_dims)
        self.out_stacks = out_stacks
        self.own_out = own_out

        self.gemms = {
            cp: tuple(jnp.asarray(col, dtype=jnp.int32)
                      for col in zip(*rows))
            for cp, rows in gemm_rows.items()}
        self.scats = {}
        for key, rows in scat_rows.items():
            gis, ois, cs = zip(*rows)
            self.scats[key] = (jnp.asarray(gis, dtype=jnp.int32),
                               jnp.asarray(ois, dtype=jnp.int32),
                               jnp.asarray(cs, dtype=self.dtype))

        # einsum: z-batched tensordot with output in (freeA + freeB) order
        la = [""] * A.ndim
        lb = [""] * B.ndim
        pool = iter(_LETTERS)
        for i, j in zip(axA, axB):
            c = next(pool)
            la[i] = c
            lb[j] = c
        for i in freeA:
            la[i] = next(pool)
        for j in freeB:
            lb[j] = next(pool)
        out_letters = [la[i] for i in freeA] + [lb[j] for j in freeB]
        self.einsum_str = ("z" + "".join(la) + ",z" + "".join(lb)
                           + "->z" + "".join(out_letters))
        self.out_perm = out_perm

    def flops(self) -> float:
        """Total multiply-add FLOPs of one apply() over the padded batched
        einsums (2 * batch * prod(A dims) * prod(B free dims) per class
        pair).  XLA's cost_analysis badly under-reports these
        gather/scatter-composed programs, so benchmarks use this count."""
        total = 0.0
        for (ack, bck), (ai, _bi) in self.gemms.items():
            z = int(ai.shape[0])
            free_b = [d for j, d in enumerate(bck) if j not in self._axB]
            total += 2.0 * z * float(np.prod(ack)) * float(np.prod(free_b))
        return total

    # -- application ------------------------------------------------------
    def apply(self, A_arrays: Dict, B_arrays: Dict,
              out_arrays: Optional[Dict] = None) -> Dict:
        """out[ock][oi] += coeff * einsum(A[ack][ai], B[bck][bi])."""
        prods: Dict[Tuple, jnp.ndarray] = {}
        for cp, (ai, bi) in self.gemms.items():
            ack, bck = cp
            a = A_arrays[ack][ai]
            b = B_arrays[bck][bi]
            prods[cp] = jnp.einsum(self.einsum_str, a, b)
        if out_arrays is None:
            out_arrays = {
                ck: jnp.zeros((len(self.out_stacks.classes[ck]),) + ck,
                              dtype=self.dtype)
                for ck in self.out_stacks.class_keys}
        for (ack, bck, ock), (gi, oi, cs) in self.scats.items():
            m = prods[(ack, bck)][gi]
            if self.out_perm is not None:
                m = jnp.transpose(
                    m, (0,) + tuple(p + 1 for p in self.out_perm))
            m = m * cs.reshape((-1,) + (1,) * (m.ndim - 1))
            out_arrays[ock] = out_arrays[ock].at[oi].add(m)
        return out_arrays


def _stacks_sig(s: _Stacks):
    return tuple(sorted((k, v) for k, v in s.pos.items()))


class PaddedHACSU2:
    """Bucketed batched H_AC for the channel-stacked SU(2) MPO.

    Stages mirror the dict path (algorithms/vumps.py apply_H_AC, 4-leg
    branch):

        Y1 = GL3 . AC            over (ket | vl)        -> (bra, ch, p, vr)
        Y2 = W4 . Y1             over ((ch,pIN)|(ch,p)) -> (pO, chB, bra, vr)
        out = (Y2 . GR3)^T(1,0,2) over ((vr,chB)|(ket,ch)) -> (bra_l, pO, bra_r)

    The Krylov vector is the concatenation of the bucketed AC stacks; the
    final stage scatters directly into that layout with the transpose
    recoupling folded into its coefficients.
    """

    def __init__(self, GL3: FusionTensor, W4: FusionTensor,
                 GR3: FusionTensor, AC: FusionTensor):
        self.dtype = AC.dtype
        C = max(max((d for _, d in W4.spaces[0]), default=1),
                max((d for _, d in W4.spaces[3]), default=1))
        self.C = C

        ac_struct = OperandStruct.of(AC, use_allowed=True)
        gl_struct = OperandStruct.of(GL3, use_allowed=True)
        gr_struct = OperandStruct.of(GR3, use_allowed=True)
        w_struct = OperandStruct.of(W4, use_allowed=False)

        self.ac = build_stacks(ac_struct, self.dtype, exact_axes={1})
        self.gl = build_stacks(gl_struct, self.dtype, fixed_axes={2: C})
        self.gr = build_stacks(gr_struct, self.dtype, fixed_axes={2: C})
        self.w = build_stacks(w_struct, self.dtype,
                              fixed_axes={0: C, 3: C}, exact_axes={1, 2})
        self.Wp = self.w.fill(self.w.zeros(), W4.blocks)
        import hashlib
        h = hashlib.sha1()
        for ck in self.w.class_keys:
            h.update(np.ascontiguousarray(
                np.asarray(self.Wp[ck])).tobytes())
        self._wsig = (tuple(self.w.pos.items()), h.hexdigest())

        self.p1 = FusionDotPlan(gl_struct, ac_struct, ([1], [0]),
                                self.gl, self.ac)
        y1_struct = OperandStruct(
            GL3.group, self.p1.out_spaces, self.p1.out_arrows,
            sorted(self.p1.out_stacks.pos.keys()))
        self.p2 = FusionDotPlan(w_struct, y1_struct, ([0, 2], [1, 2]),
                                self.w, self.p1.out_stacks)
        y2_struct = OperandStruct(
            GL3.group, self.p2.out_spaces, self.p2.out_arrows,
            sorted(self.p2.out_stacks.pos.keys()))
        self.p3 = FusionDotPlan(y2_struct, gr_struct, ([3, 1], [0, 2]),
                                self.p2.out_stacks, self.gr,
                                out_stacks=self.ac, out_perm=(1, 0, 2))

        # Krylov vector layout over the AC stacks
        self.vec_meta = []
        off = 0
        for ck in self.ac.class_keys:
            n = len(self.ac.classes[ck])
            sz = n * int(np.prod(ck))
            self.vec_meta.append((ck, n, off, sz))
            off += sz
        self.total = off

    # -- hashability ------------------------------------------------------
    def _sig(self):
        return (_stacks_sig(self.ac), _stacks_sig(self.gl),
                _stacks_sig(self.gr), self.C, str(self.dtype), self._wsig)

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, PaddedHACSU2) and self._sig() == other._sig()

    # -- packing ----------------------------------------------------------
    def pack_vec(self, AC: FusionTensor) -> jnp.ndarray:
        stacks = self.ac.fill(self.ac.zeros(), AC.blocks)
        parts = [stacks[ck].reshape(-1) for ck, _, _, _ in self.vec_meta]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unpack_vec(self, vec: jnp.ndarray,
                   template: FusionTensor) -> FusionTensor:
        blocks = {}
        for ck, n, off, sz in self.vec_meta:
            arr = vec[off:off + sz].reshape((n,) + ck)
            for i, k in enumerate(self.ac.classes[ck]):
                dims = self.ac.dims[k]
                sl = (i,) + tuple(slice(0, d) for d in dims)
                blocks[k] = arr[sl]
        return FusionTensor(template.group, template.spaces, template.arrows,
                            blocks, template.charge, self.dtype)

    def pack_gl(self, GL3: FusionTensor):
        return self.gl.fill(self.gl.zeros(), GL3.blocks)

    def pack_gr(self, GR3: FusionTensor):
        return self.gr.fill(self.gr.zeros(), GR3.blocks)

    # -- matvec -----------------------------------------------------------
    def matvec(self, vec: jnp.ndarray, GLp, GRp) -> jnp.ndarray:
        ACs = {}
        for ck, n, off, sz in self.vec_meta:
            ACs[ck] = vec[off:off + sz].reshape((n,) + ck)
        Y1 = self.p1.apply(GLp, ACs)
        Y2 = self.p2.apply(self.Wp, Y1)
        OUT = self.p3.apply(Y2, GRp)
        return jnp.concatenate(
            [OUT[ck].reshape(-1) for ck, _, _, _ in self.vec_meta])

    def matvec_flops(self) -> float:
        """Analytic FLOPs of one matvec (see FusionDotPlan.flops)."""
        return self.p1.flops() + self.p2.flops() + self.p3.flops()


class PaddedHCSU2:
    """Bucketed batched zero-site H_C for the channel-stacked SU(2) MPO:

        out = (GL3 . C . GR3) over the shared channel leg, i.e.
        Y1 = GL3 . C   over (ket | vl)          -> (bra, ch, r)
        out = (Y1 . GR3)^T over ((r, ch)|(ket, ch)) -> (bra_l, bra_r)
    """

    def __init__(self, GL3: FusionTensor, GR3: FusionTensor,
                 C: FusionTensor):
        self.dtype = C.dtype
        Cch = max(max((d for _, d in GL3.spaces[2]), default=1),
                  max((d for _, d in GR3.spaces[2]), default=1))
        self.C = Cch
        c_struct = OperandStruct.of(C, use_allowed=True)
        gl_struct = OperandStruct.of(GL3, use_allowed=True)
        gr_struct = OperandStruct.of(GR3, use_allowed=True)
        self.c = build_stacks(c_struct, self.dtype)
        self.gl = build_stacks(gl_struct, self.dtype, fixed_axes={2: Cch})
        self.gr = build_stacks(gr_struct, self.dtype, fixed_axes={2: Cch})

        self.p1 = FusionDotPlan(gl_struct, c_struct, ([1], [0]),
                                self.gl, self.c)
        y1_struct = OperandStruct(
            GL3.group, self.p1.out_spaces, self.p1.out_arrows,
            sorted(self.p1.out_stacks.pos.keys()))
        self.p2 = FusionDotPlan(y1_struct, gr_struct, ([2, 1], [0, 2]),
                                self.p1.out_stacks, self.gr,
                                out_stacks=self.c)

        self.vec_meta = []
        off = 0
        for ck in self.c.class_keys:
            n = len(self.c.classes[ck])
            sz = n * int(np.prod(ck))
            self.vec_meta.append((ck, n, off, sz))
            off += sz
        self.total = off

    def _sig(self):
        return (_stacks_sig(self.c), _stacks_sig(self.gl),
                _stacks_sig(self.gr), self.C, str(self.dtype))

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, PaddedHCSU2) and self._sig() == other._sig()

    def pack_vec(self, C: FusionTensor) -> jnp.ndarray:
        stacks = self.c.fill(self.c.zeros(), C.blocks)
        parts = [stacks[ck].reshape(-1) for ck, _, _, _ in self.vec_meta]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unpack_vec(self, vec: jnp.ndarray,
                   template: FusionTensor) -> FusionTensor:
        blocks = {}
        for ck, n, off, sz in self.vec_meta:
            arr = vec[off:off + sz].reshape((n,) + ck)
            for i, k in enumerate(self.c.classes[ck]):
                dims = self.c.dims[k]
                sl = (i,) + tuple(slice(0, d) for d in dims)
                blocks[k] = arr[sl]
        return FusionTensor(template.group, template.spaces, template.arrows,
                            blocks, template.charge, self.dtype)

    def pack_gl(self, GL3: FusionTensor):
        return self.gl.fill(self.gl.zeros(), GL3.blocks)

    def pack_gr(self, GR3: FusionTensor):
        return self.gr.fill(self.gr.zeros(), GR3.blocks)

    def matvec(self, vec: jnp.ndarray, GLp, GRp) -> jnp.ndarray:
        Cs = {}
        for ck, n, off, sz in self.vec_meta:
            Cs[ck] = vec[off:off + sz].reshape((n,) + ck)
        Y1 = self.p1.apply(GLp, Cs)
        OUT = self.p2.apply(Y1, GRp)
        return jnp.concatenate(
            [OUT[ck].reshape(-1) for ck, _, _, _ in self.vec_meta])

    def matvec_flops(self) -> float:
        """Analytic FLOPs of one matvec (see FusionDotPlan.flops)."""
        return self.p1.flops() + self.p2.flops()
