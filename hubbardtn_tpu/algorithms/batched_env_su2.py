"""Fused SU(2) environment refresh: one jitted program per side.

The SU(2) environment fixed points (algorithms/environments.py) compose
presweeps, two GMRES geometric sums, and interior fills as host-sequenced
dispatches — over the tunneled TPU each dispatch costs an RPC, and the
Krylov restarts sync the host every iteration.  This engine fuses the
whole per-side refresh into ONE jitted program:

* presweeps and interior fills run the per-channel dict transfers
  (environments.mpo_transfer_left/right over FusionTensors) traced
  inline: channels are pinned by static dict overwrites, so XLA's
  dead-code elimination prunes every chain that cannot reach a live
  output.  A channel-stacked variant of these transfers measured ~6.3x
  MORE compute via XLA's cost analysis — runtime channel masks block DCE,
  and the pad waste of bucketed stacks costs real FLOPs on the one-shot
  transfer GEMMs (unlike the inner eigensolves, where bucketed batching
  pays for thousands of identical small contractions per Lanczos run);
* zero templates and the bond identity are created inside the trace, so
  the algebraic simplifier folds the template adds outright;
* the regularized geometric-sum operator runs on a packed (bra, ket,
  trivial-channel) vector through planned :class:`FusionDotPlan` cell
  transfers, with the rank-1 energy correction evaluated by a planned
  full pairing — an early-exiting 30-step GMRES restart, warm-started
  from the previous VUMPS iteration via x0; the host retries extra warm
  restarts only when the device-tracked residual misses the tolerance.

Everything is exact: the transfers ARE the dict path (same contractions,
same cached recoupling projections; validated block-for-block in
tests/test_batched_env_su2.py).  Opt out with HTN_NO_SU2_ENV_PACK=1.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..symmetry.spaces import Space
from ..tensor.fusion import FusionTensor, append_trivial_leg
from ..tensor.symtensor import IN, OUT
from .batched_fusion import (FusionDotPlan, OperandStruct, build_stacks,
                             _Stacks)


def _flatten_meta(stacks: _Stacks):
    meta = []
    off = 0
    for ck in stacks.class_keys:
        n = len(stacks.classes[ck])
        sz = n * int(np.prod(ck))
        meta.append((ck, n, off, sz))
        off += sz
    return meta, off


class XLayoutSU2:
    """Layout of the GMRES variable: 3-leg (bra, ket, trivial channel)."""

    def __init__(self, tmpl3: FusionTensor, dtype):
        self.struct = OperandStruct.of(tmpl3, use_allowed=True)
        self.stacks = build_stacks(self.struct, dtype, exact_axes={2})
        self.meta, self.total = _flatten_meta(self.stacks)
        self.dtype = dtype

    def pack_vec(self, t3: FusionTensor) -> jnp.ndarray:
        stacks = self.stacks.fill(self.stacks.zeros(), t3.blocks)
        parts = [stacks[ck].reshape(-1) for ck, _, _, _ in self.meta]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unflatten(self, vec: jnp.ndarray) -> Dict:
        out = {}
        for ck, n, off, sz in self.meta:
            out[ck] = vec[off:off + sz].reshape((n,) + ck)
        return out

    def flatten(self, arrays: Dict) -> jnp.ndarray:
        return jnp.concatenate(
            [arrays[ck].reshape(-1) for ck, _, _, _ in self.meta])

    def unpack(self, vec: jnp.ndarray, template: FusionTensor
               ) -> FusionTensor:
        arrays = self.unflatten(vec)
        blocks = {}
        for ck, n, off, sz in self.meta:
            for i, k in enumerate(self.stacks.classes[ck]):
                dims = self.stacks.dims[k]
                sl = (i,) + tuple(slice(0, d) for d in dims)
                blocks[k] = arrays[ck][sl]
        return FusionTensor(template.group, template.spaces, template.arrows,
                            blocks, template.charge, self.dtype)


class CellTransferSU2:
    """One-site plain (no-MPO) transfer on the trivial-channel X layout."""

    def __init__(self, lay_in: XLayoutSU2, A: FusionTensor,
                 lay_out: XLayoutSU2, left: bool,
                 a_stacks: _Stacks, abar_stacks: _Stacks):
        g = A.group
        a_struct = OperandStruct.of(A, use_allowed=True)
        abar_struct = OperandStruct.of(A.conj(), use_allowed=True)
        if left:
            # Y1 = X . A -> (b, ch, p, k'); out = (Abar . Y1)^T(0,2,1)
            self.p1 = FusionDotPlan(lay_in.struct, a_struct, ([1], [0]),
                                    lay_in.stacks, a_stacks)
            y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                               sorted(self.p1.out_stacks.pos.keys()))
            self.p2 = FusionDotPlan(abar_struct, y1, ([0, 1], [0, 2]),
                                    abar_stacks, self.p1.out_stacks,
                                    out_stacks=lay_out.stacks,
                                    out_perm=(0, 2, 1))
        else:
            # Y1 = A . X -> (k', p, b, ch); out = (Y1 . Abar)^T(0,2,1)
            self.p1 = FusionDotPlan(a_struct, lay_in.struct, ([2], [0]),
                                    a_stacks, lay_in.stacks)
            y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                               sorted(self.p1.out_stacks.pos.keys()))
            self.p2 = FusionDotPlan(y1, abar_struct, ([1, 2], [1, 2]),
                                    self.p1.out_stacks, abar_stacks,
                                    out_stacks=lay_out.stacks,
                                    out_perm=(0, 2, 1))
        self.left = left

    def apply(self, x_arrays: Dict, a_arrays, abar_arrays) -> Dict:
        if self.left:
            Y1 = self.p1.apply(x_arrays, a_arrays)
            return self.p2.apply(abar_arrays, Y1)
        Y1 = self.p1.apply(a_arrays, x_arrays)
        return self.p2.apply(Y1, abar_arrays)


class PairPlanSU2:
    """Planned full pairing (environments.pair_envs) of two 3-leg tensors.
    ``x_first`` matches the dict call's operand order: pair_envs(X, R) for
    the left side, pair_envs(R, X) for the right."""

    def __init__(self, x_lay: XLayoutSU2, r3: FusionTensor,
                 x_first: bool = True):
        self.r_struct = OperandStruct.of(r3, use_allowed=True)
        self.r_stacks = build_stacks(self.r_struct, x_lay.dtype,
                                     exact_axes={2})
        if x_first:
            self.plan = FusionDotPlan(x_lay.struct, self.r_struct,
                                      ([1, 0, 2], [0, 1, 2]),
                                      x_lay.stacks, self.r_stacks)
        else:
            self.plan = FusionDotPlan(self.r_struct, x_lay.struct,
                                      ([1, 0, 2], [0, 1, 2]),
                                      self.r_stacks, x_lay.stacks)
        self.x_first = x_first
        self.x_lay = x_lay

    def pack_r(self, r3: FusionTensor):
        return self.r_stacks.fill(self.r_stacks.zeros(), r3.blocks)

    def value(self, x_arrays: Dict, r_arrays: Dict) -> jnp.ndarray:
        out = (self.plan.apply(x_arrays, r_arrays) if self.x_first
               else self.plan.apply(r_arrays, x_arrays))
        acc = jnp.zeros((), dtype=self.x_lay.dtype)
        for arr in out.values():
            acc = acc + jnp.sum(arr)
        return acc


class EnvLayoutSU2:
    """Bucketed stack layout of one bond's channel-packed 3-leg env
    (fusion-tree block tables; channel axis fixed to the global pad)."""

    def __init__(self, tmpl3: FusionTensor, Cch: int, dtype):
        self.struct = OperandStruct.of(tmpl3, use_allowed=True)
        self.stacks = build_stacks(self.struct, dtype, fixed_axes={2: Cch})
        self.Cch = Cch
        self.dtype = dtype

    def zeros(self):
        return self.stacks.zeros()


class SU2EnvEngine:
    """Per-structure SU(2) environment refresh: presweeps, geometric-sum
    GMRES, and interior fills on bucketed channel-stacked arrays.

    Built once per (H, MPS block structure); the jitted closures keep their
    compiled programs across VUMPS iterations at a fixed structure."""

    _cache: Dict = {}
    _CACHE_MAX = 4

    @classmethod
    def get(cls, psi, H) -> "SU2EnvEngine":
        # the cache entry keeps a strong reference to H, so id(H) cannot be
        # recycled by a different Hamiltonian while the entry lives
        import os
        key = (id(H),
               tuple(a.structure() for a in psi.ALs),
               tuple(a.structure() for a in psi.ARs),
               str(psi.ALs[0].dtype),
               os.environ.get("HTN_ENV_TRANSFER", "batched"))
        hit = cls._cache.get(key)
        if hit is not None and hit[0] is H:
            return hit[1]
        eng = cls(psi, H)
        if len(cls._cache) >= cls._CACHE_MAX:
            cls._cache.pop(next(iter(cls._cache)))
        cls._cache[key] = (H, eng)
        return eng

    def __init__(self, psi, H):
        import math

        T = psi.T
        g = psi.group
        dtype = psi.ALs[0].dtype
        self.T, self.group, self.dtype = T, g, dtype
        self._rdt = jnp.real(jnp.zeros((), dtype)).dtype
        self.n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
        self.fin = H.idx_final(0)
        self.H = H
        self.charges = H.charges
        # W ops close over the jitted sweeps as in-jit constants, cast once
        self.Ws = tuple(
            {ab: FusionTensor(op.group, op.spaces, op.arrows,
                              {bk: jnp.asarray(np.asarray(b), dtype=dtype)
                               for bk, b in op.blocks.items()},
                              op.charge, dtype)
             for ab, op in W.items()} for W in H.Ws)

        VL = [psi.ALs[x].spaces[0] for x in range(T)]   # bond left of x
        VR = [psi.ARs[x].spaces[2] for x in range(T)]   # bond right of x
        zeros = FusionTensor.zeros

        def a_layouts(A):
            a_struct = OperandStruct.of(A, use_allowed=True)
            abar_struct = OperandStruct.of(A.conj(), use_allowed=True)
            return (build_stacks(a_struct, dtype, exact_axes={1}),
                    build_stacks(abar_struct, dtype, exact_axes={1}))

        # ---- left ----
        self._astL = [a_layouts(psi.ALs[x]) for x in range(T)]
        xtmplL = [zeros(g, (VL[x], VL[x], Space(g, {g.trivial: 1})),
                        (IN, OUT, IN), dtype=dtype, fill=False)
                  for x in range(T)]
        self.xlayL = [XLayoutSU2(xtmplL[x], dtype) for x in range(T)]
        self.cellL = [CellTransferSU2(self.xlayL[x], psi.ALs[x],
                                      self.xlayL[(x + 1) % T], True,
                                      *self._astL[x])
                      for x in range(T)]
        rho3_tmpl = zeros(g, (VL[0], VL[0], Space(g, {g.trivial: 1})),
                          (IN, OUT, OUT), dtype=dtype, fill=False)
        self.pairL = PairPlanSU2(self.xlayL[0], rho3_tmpl, x_first=True)

        # ---- right ----
        self._astR = [a_layouts(psi.ARs[x]) for x in range(T)]
        xtmplR = [zeros(g, (VR[x], VR[x], Space(g, {g.trivial: 1})),
                        (IN, OUT, OUT), dtype=dtype, fill=False)
                  for x in range(T)]
        self.xlayR = [XLayoutSU2(xtmplR[x], dtype) for x in range(T)]
        self.cellR = [CellTransferSU2(self.xlayR[x], psi.ARs[x],
                                      self.xlayR[(x - 1) % T], False,
                                      *self._astR[x])
                      for x in range(T)]
        sig3_tmpl = zeros(g, (VR[T - 1], VR[T - 1],
                              Space(g, {g.trivial: 1})),
                          (IN, OUT, IN), dtype=dtype, fill=False)
        self.pairR = PairPlanSU2(self.xlayR[T - 1], sig3_tmpl, x_first=False)

        self.VL, self.VR = VL, VR

        # class-batched one-site MPO transfers for the presweeps/fills
        # (HTN_ENV_TRANSFER=dict restores the inline dict transfers)
        import os
        self.transfer_mode = os.environ.get("HTN_ENV_TRANSFER", "batched")
        if self.transfer_mode != "dict":
            from ..mpo.su2_pack import PackedMPOSU2
            from .batched_transfer import SU2TransferLeft, SU2TransferRight
            pm = PackedMPOSU2(H)
            self.pm = pm
            Cch = max(max(d for _, d in m.space) for m in pm.maps)
            self.Cch = Cch
            self.layS_gl = [EnvLayoutSU2(
                zeros(g, (VL[x], VL[x], pm.maps[x].space), (IN, OUT, IN),
                      dtype=dtype, fill=False), Cch, dtype)
                for x in range(T)]
            self.layS_gr = [EnvLayoutSU2(
                zeros(g, (VR[x], VR[x], pm.maps[(x + 1) % T].space),
                      (IN, OUT, OUT), dtype=dtype, fill=False), Cch, dtype)
                for x in range(T)]
            self.tplanL = [SU2TransferLeft(
                self.layS_gl[x], pm.Ws[x], psi.ALs[x],
                self.layS_gl[(x + 1) % T], *self._astL[x])
                for x in range(T)]
            self.tplanR = [SU2TransferRight(
                self.layS_gr[x], pm.Ws[x], psi.ARs[x],
                self.layS_gr[(x - 1) % T], *self._astR[x])
                for x in range(T)]
            from ..mps.imps import bond_identity
            m0 = pm.maps[0]
            self.finR = len(m0.charges) - 1
            I0L = append_trivial_leg(bond_identity(g, VL[0], dtype=dtype),
                                     IN)
            I0R = append_trivial_leg(bond_identity(g, VR[T - 1],
                                                   dtype=dtype), OUT)
            self._maskL, self._eyesL = self._pin_consts(
                self.layS_gl[0], m0, i0_channel=0,
                zero_channels=(0, self.fin), i0_tensor=I0L)
            self._maskR, self._eyesR = self._pin_consts(
                self.layS_gr[T - 1], m0, i0_channel=self.finR,
                zero_channels=(0, self.finR), i0_tensor=I0R)
            self._cfL = self._xl_plan(self.layS_gl[0], self.xlayL[0],
                                      m0, self.fin)
            self._cfR = self._xl_plan(self.layS_gr[T - 1],
                                      self.xlayR[T - 1], m0, 0)
            self._unplan_gl = [self._unstack_plan(
                self.layS_gl[x], pm.maps[x]) for x in range(T)]
            self._unplan_gr = [self._unstack_plan(
                self.layS_gr[x], pm.maps[(x + 1) % T]) for x in range(T)]

        self._build_jits()

    # ------------------------------------------------------------------
    def _pin_consts(self, lay: EnvLayoutSU2, cmap, i0_channel: int,
                    zero_channels, i0_tensor: FusionTensor):
        """(mask consts, identity-write plan): ``pin(stk) = stk * mask``
        followed by writing the bond identity's blocks into the pinned
        channel's slot — stack-land form of the dict presweep's
        ``cur[0] = I0; cur[fin] = 0`` channel pinning."""
        npdt = jnp.dtype(self.dtype).name
        qz = [cmap.slot[c] for c in zero_channels]
        qi, oi = cmap.slot[i0_channel]
        mask = {}
        for ck in lay.stacks.class_keys:
            keys = lay.stacks.classes[ck]
            m = np.ones((len(keys), 1, 1, ck[2]), dtype=npdt)
            for i, key in enumerate(keys):
                for qc, oc in qz:
                    if key[0][2] == qc:
                        m[i, 0, 0, oc] = 0
            mask[ck] = m
        eyes = []
        for (legs, c, t), blk in i0_tensor.blocks.items():
            key = ((legs[0], legs[1], qi), c, t)
            if key not in lay.stacks.pos:
                continue
            eck, j = lay.stacks.pos[key]
            v = np.asarray(blk)[:, :, 0].astype(npdt)
            eyes.append((eck, j, v, oi))
        return mask, eyes

    def _pin(self, stk, mask, eyes):
        out = {ck: stk[ck] * jnp.asarray(mask[ck]) for ck in stk}
        for eck, j, v, oi in eyes:
            out[eck] = out[eck].at[j, :v.shape[0], :v.shape[1], oi].set(
                jnp.asarray(v))
        return out

    def _pin_zeros(self, lay, eyes):
        out = lay.zeros()
        for eck, j, v, oi in eyes:
            out[eck] = out[eck].at[j, :v.shape[0], :v.shape[1], oi].set(
                jnp.asarray(v))
        return out

    def _xl_plan(self, lay: EnvLayoutSU2, xlay: XLayoutSU2, cmap,
                 channel: int):
        """Static gather/scatter plan between one boundary channel's env
        blocks and the GMRES XLayoutSU2 stacks (trees depend only on leg
        sector charges, so keys align one-for-one when the boundary
        channel carries the trivial charge)."""
        qc, oc = cmap.slot[channel]
        assert qc == self.group.trivial, (
            "boundary FSM channel must carry the trivial charge")
        plan = []
        for xkey, (xck, xi) in sorted(xlay.stacks.pos.items()):
            legs, c, t = xkey
            ekey = ((legs[0], legs[1], qc), c, t)
            if ekey not in lay.stacks.pos:
                continue
            eck, j = lay.stacks.pos[ekey]
            d0, d1, _ = xlay.stacks.dims[xkey]
            plan.append((xck, xi, d0, d1, eck, j, oc))
        return plan

    def _gather_xl(self, plan, xlay, stk):
        bufs = xlay.stacks.zeros()
        for xck, xi, d0, d1, eck, j, oc in plan:
            bufs[xck] = bufs[xck].at[xi, :d0, :d1, 0].set(
                stk[eck][j, :d0, :d1, oc])
        return xlay.flatten(bufs)

    def _scatter_xl(self, plan, xlay, stk, yvec):
        Y = xlay.unflatten(yvec)
        out = dict(stk)
        for xck, xi, d0, d1, eck, j, oc in plan:
            out[eck] = out[eck].at[j, :d0, :d1, oc].set(
                Y[xck][xi, :d0, :d1, 0])
        return out

    def _unstack_plan(self, lay: EnvLayoutSU2, cmap):
        plan = []
        for a, (qa, oa) in enumerate(cmap.slot):
            for key, (eck, j) in sorted(lay.stacks.pos.items()):
                if key[0][2] != qa:
                    continue
                d0, d1, _ = lay.stacks.dims[key]
                plan.append((a, key, eck, j, d0, d1, oa))
        return plan

    def _unstack_env(self, plan, stk, V, charges, left: bool):
        """Stacked per-bond env -> per-channel 3-leg dicts (slices)."""
        from ..ops.sites_su2 import channel_space
        per_a: Dict[int, Dict] = {}
        for a, key, eck, j, d0, d1, oa in plan:
            per_a.setdefault(a, {})[key] = stk[eck][j, :d0, :d1, oa:oa + 1]
        out = {}
        for a, qa in enumerate(charges):
            out[a] = FusionTensor(
                self.group, (V, V, channel_space(self.group, qa)),
                (IN, OUT, IN if left else OUT), per_a.get(a, {}), None,
                self.dtype)
        return out

    # ------------------------------------------------------------------
    def _build_jits(self):
        T, g, dtype = self.T, self.group, self.dtype
        from ..mps.imps import bond_identity
        from ..solvers.krylov import _gmres_restart_core
        from .environments import (_jit_fill_left, _jit_fill_right,
                                   _presweep_left, _presweep_right,
                                   _zero_env_left, _zero_env_right)

        Ws = self.Ws  # dtype-cast per-transition 4-leg ops (constants)

        def pack_ab(ast, A):
            a_st, abar_st = ast
            return (a_st.fill(a_st.zeros(), A.blocks),
                    abar_st.fill(abar_st.zeros(), A.conj().blocks))

        def tmpls_left():
            # in-trace zero templates: XLA folds the template adds and
            # dead-code-eliminates channel chains the outputs never use
            return [_zero_env_left(g, self.VL[x], self.charges[x], dtype)
                    for x in range(T)]

        def tmpls_right():
            return [_zero_env_right(g, self.VR[x],
                                    self.charges[(x + 1) % T], dtype)
                    for x in range(T)]

        # ---- left ----
        def sweep_left(ALs, rho_arrays):
            tmplL = tmpls_left()
            I0 = append_trivial_leg(
                bond_identity(g, self.VL[0], dtype=dtype), IN)
            cur, CF = _presweep_left(tmplL[0], Ws, ALs, I0,
                                     n_sweeps=self.n_sweeps, fin=self.fin)
            xlay = self.xlayL[0]
            i0x = xlay.pack_vec(I0)
            cfx = xlay.stacks.fill(xlay.stacks.zeros(), CF.blocks)
            tr = self.pairL.value(xlay.unflatten(i0x), rho_arrays)
            e = self.pairL.value(cfx, rho_arrays) / tr
            rhs = xlay.flatten(cfx) - e * i0x
            return cur, rhs, e, tr, i0x

        def regL_mv(v, a_ab, rho_arrays, i0x, tr):
            X = self.xlayL[0].unflatten(v)
            for x in range(T):
                X = self.cellL[x].apply(X, *a_ab[x])
            ty = self.xlayL[0].flatten(X)
            corr = self.pairL.value(self.xlayL[0].unflatten(v),
                                    rho_arrays) / tr
            return v - ty + corr * i0x

        def gmresL(x0, rhs, ALs, rho_arrays, tr, atol):
            a_ab = [pack_ab(self._astL[x], ALs[x]) for x in range(T)]
            I0 = append_trivial_leg(
                bond_identity(g, self.VL[0], dtype=dtype), IN)
            i0x = self.xlayL[0].pack_vec(I0)
            x, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, a_ab, rho_arrays, i0x, tr), x0, rhs,
                30, atol=atol)
            return x, resid

        def finalize_left(cur, y, ALs):
            tmplL = tmpls_left()
            GL0 = dict(cur)
            GL0[0] = append_trivial_leg(
                bond_identity(g, self.VL[0], dtype=dtype), IN)
            GL0[self.fin] = self.xlayL[0].unpack(y, tmplL[0][self.fin])
            return list(_jit_fill_left(GL0, Ws, ALs, tmplL))

        def refresh_left(ALs, rho_arrays, x0, tol_s):
            """Whole left refresh (presweep + ONE early-exiting <=30-step
            GMRES restart + fills) as a single program: over the TPU
            tunnel, host-sequenced sub-stage dispatches cost far more than
            the compute (65.8 -> ~10 ms at dense chi~2874, bench round 2);
            warm-started steady-state solves exit the device GMRES loop
            after a few matvecs."""
            cur, rhs, e, tr, i0x = sweep_left(ALs, rho_arrays)
            a_ab = [pack_ab(self._astL[x], ALs[x]) for x in range(T)]
            y, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, a_ab, rho_arrays, i0x, tr), x0, rhs,
                30, atol=tol_s * jnp.linalg.norm(rhs))
            GLs = finalize_left(cur, y, ALs)
            return GLs, e, y, resid, rhs, cur, tr

        # ---- right ----
        def sweep_right(ARs, sig_arrays):
            tmplR = tmpls_right()
            I0 = append_trivial_leg(
                bond_identity(g, self.VR[T - 1], dtype=dtype), OUT)
            cur, CI = _presweep_right(tmplR[T - 1], Ws, ARs, I0,
                                      n_sweeps=self.n_sweeps)
            xlay = self.xlayR[T - 1]
            i0x = xlay.pack_vec(I0)
            cix = xlay.stacks.fill(xlay.stacks.zeros(), CI.blocks)
            tr = self.pairR.value(xlay.unflatten(i0x), sig_arrays)
            e = self.pairR.value(cix, sig_arrays) / tr
            rhs = xlay.flatten(cix) - e * i0x
            return cur, rhs, e, tr, i0x

        def regR_mv(v, a_ab, sig_arrays, i0x, tr):
            X = self.xlayR[T - 1].unflatten(v)
            for x in reversed(range(T)):
                X = self.cellR[x].apply(X, *a_ab[x])
            ty = self.xlayR[T - 1].flatten(X)
            corr = self.pairR.value(self.xlayR[T - 1].unflatten(v),
                                    sig_arrays) / tr
            return v - ty + corr * i0x

        def gmresR(x0, rhs, ARs, sig_arrays, tr, atol):
            a_ab = [pack_ab(self._astR[x], ARs[x]) for x in range(T)]
            I0 = append_trivial_leg(
                bond_identity(g, self.VR[T - 1], dtype=dtype), OUT)
            i0x = self.xlayR[T - 1].pack_vec(I0)
            x, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, a_ab, sig_arrays, i0x, tr), x0, rhs,
                30, atol=atol)
            return x, resid

        def finalize_right(cur, y, ARs):
            tmplR = tmpls_right()
            GR0 = dict(cur)
            GR0[0] = self.xlayR[T - 1].unpack(y, tmplR[T - 1][0])
            return list(_jit_fill_right(GR0, Ws, ARs, tmplR))

        def refresh_right(ARs, sig_arrays, x0, tol_s):
            cur, rhs, e, tr, i0x = sweep_right(ARs, sig_arrays)
            a_ab = [pack_ab(self._astR[x], ARs[x]) for x in range(T)]
            y, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, a_ab, sig_arrays, i0x, tr), x0, rhs,
                30, atol=tol_s * jnp.linalg.norm(rhs))
            GRs = finalize_right(cur, y, ARs)
            return GRs, e, y, resid, rhs, cur, tr

        if self.transfer_mode != "dict":
            # class-batched presweeps/fills (batched_transfer.py): the
            # refresh_* closures above pick these up by late binding.
            # Same semantics as the dict versions (pinned-boundary cell
            # sweeps, boundary-channel inflow, interior fills), but every
            # one-site transfer is three chained FusionDotPlans on the
            # stacked env layout; per-channel dicts are SLICES of the
            # stacks (DCE'd when dead).  The A packs are the same
            # pack_ab the GMRES uses — XLA CSE dedups them in-program.
            def sweep_left(ALs, rho_arrays):
                a_ab = [pack_ab(self._astL[x], ALs[x]) for x in range(T)]
                stk = self._pin_zeros(self.layS_gl[0], self._eyesL)
                for _ in range(self.n_sweeps):
                    for x in range(T):
                        stk = self.tplanL[x].apply(stk, *a_ab[x])
                    stk = self._pin(stk, self._maskL, self._eyesL)
                fill = stk
                for x in range(T):
                    fill = self.tplanL[x].apply(fill, *a_ab[x])
                cf = self._gather_xl(self._cfL, self.xlayL[0], fill)
                I0 = append_trivial_leg(
                    bond_identity(g, self.VL[0], dtype=dtype), IN)
                i0x = self.xlayL[0].pack_vec(I0)
                tr = self.pairL.value(self.xlayL[0].unflatten(i0x),
                                      rho_arrays)
                e = self.pairL.value(self.xlayL[0].unflatten(cf),
                                     rho_arrays) / tr
                rhs = cf - e * i0x
                return stk, rhs, e, tr, i0x

            def finalize_left(cur, y, ALs):
                a_ab = [pack_ab(self._astL[x], ALs[x]) for x in range(T)]
                stk0 = self._scatter_xl(self._cfL, self.xlayL[0], cur, y)
                stacks = [stk0]
                for x in range(T - 1):
                    stacks.append(self.tplanL[x].apply(stacks[x],
                                                       *a_ab[x]))
                return [self._unstack_env(self._unplan_gl[x], stacks[x],
                                          self.VL[x], self.charges[x],
                                          left=True) for x in range(T)]

            def sweep_right(ARs, sig_arrays):
                a_ab = [pack_ab(self._astR[x], ARs[x]) for x in range(T)]
                stk = self._pin_zeros(self.layS_gr[T - 1], self._eyesR)
                for _ in range(self.n_sweeps):
                    for x in reversed(range(T)):
                        stk = self.tplanR[x].apply(stk, *a_ab[x])
                    stk = self._pin(stk, self._maskR, self._eyesR)
                fill = stk
                for x in reversed(range(T)):
                    fill = self.tplanR[x].apply(fill, *a_ab[x])
                ci = self._gather_xl(self._cfR, self.xlayR[T - 1], fill)
                I0 = append_trivial_leg(
                    bond_identity(g, self.VR[T - 1], dtype=dtype), OUT)
                i0x = self.xlayR[T - 1].pack_vec(I0)
                tr = self.pairR.value(self.xlayR[T - 1].unflatten(i0x),
                                      sig_arrays)
                e = self.pairR.value(self.xlayR[T - 1].unflatten(ci),
                                     sig_arrays) / tr
                rhs = ci - e * i0x
                return stk, rhs, e, tr, i0x

            def finalize_right(cur, y, ARs):
                a_ab = [pack_ab(self._astR[x], ARs[x]) for x in range(T)]
                stk_last = self._scatter_xl(self._cfR, self.xlayR[T - 1],
                                            cur, y)
                stacks = [None] * T
                stacks[T - 1] = stk_last
                for x in reversed(range(1, T)):
                    stacks[x - 1] = self.tplanR[x].apply(stacks[x],
                                                         *a_ab[x])
                return [self._unstack_env(self._unplan_gr[x], stacks[x],
                                          self.VR[x],
                                          self.charges[(x + 1) % T],
                                          left=False) for x in range(T)]

        self._sweep_left = jax.jit(sweep_left)
        self._gmresL = jax.jit(gmresL)
        self._finalize_left = jax.jit(finalize_left)
        self._sweep_right = jax.jit(sweep_right)
        self._gmresR = jax.jit(gmresR)
        self._finalize_right = jax.jit(finalize_right)
        self._refresh_left = jax.jit(refresh_left)
        self._refresh_right = jax.jit(refresh_right)
        # raw (unjitted) pieces: the fused whole-iteration VUMPS program
        # (algorithms/fused_vumps_su2.py) inlines them into its own trace
        self.raw = {
            "sweep_left": sweep_left, "regL_mv": regL_mv,
            "finalize_left": finalize_left,
            "sweep_right": sweep_right, "regR_mv": regR_mv,
            "finalize_right": finalize_right,
            "pack_abL": lambda ALs: [pack_ab(self._astL[x], ALs[x])
                                     for x in range(T)],
            "pack_abR": lambda ARs: [pack_ab(self._astR[x], ARs[x])
                                     for x in range(T)],
        }

    # ------------------------------------------------------------------
    def left(self, psi, H, tol: float, gl_final0=None):
        """Device contract (utils/device.py): operands packed on the host,
        shipped once; the jitted refresh runs on the accelerator when one
        is visible; dict results are pulled back for the structure layer."""
        from ..utils.device import to_accel, to_host
        from .environments import rho_right
        T = self.T
        ALt = tuple(psi.ALs)
        rho3 = append_trivial_leg(rho_right(psi.Cs[T - 1]), OUT)
        rho_arrays = self.pairL.pack_r(rho3)
        x0 = (self.xlayL[0].pack_vec(gl_final0)
              if gl_final0 is not None
              and gl_final0.spaces[:2] == (self.VL[0], self.VL[0])
              else jnp.zeros((self.xlayL[0].total,), dtype=self.dtype))
        ALt, rho_arrays, x0 = to_accel((ALt, rho_arrays, x0))
        GLs, e, x, resid, rhs, cur, tr = self._refresh_left(
            ALt, rho_arrays, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            # extra warm-started restarts until the host-checked tol holds
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresL(x, rhs, ALt, rho_arrays, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GLs = self._finalize_left(cur, x, ALt)
        return to_host((GLs, e))

    def right(self, psi, H, tol: float, gr_init0=None):
        from ..utils.device import to_accel, to_host
        from .environments import rho_left
        T = self.T
        ARt = tuple(psi.ARs)
        sig3 = append_trivial_leg(rho_left(psi.Cs[T - 1]), IN)
        sig_arrays = self.pairR.pack_r(sig3)
        x0 = (self.xlayR[T - 1].pack_vec(gr_init0)
              if gr_init0 is not None
              and gr_init0.spaces[:2] == (self.VR[T - 1], self.VR[T - 1])
              else jnp.zeros((self.xlayR[T - 1].total,), dtype=self.dtype))
        ARt, sig_arrays, x0 = to_accel((ARt, sig_arrays, x0))
        GRs, e, x, resid, rhs, cur, tr = self._refresh_right(
            ARt, sig_arrays, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresR(x, rhs, ARt, sig_arrays, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GRs = self._finalize_right(cur, x, ARt)
        return to_host((GRs, e))
