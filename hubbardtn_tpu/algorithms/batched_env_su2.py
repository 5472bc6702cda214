"""Bucketed batched SU(2) environment refresh.

The SU(2) environment fixed points (algorithms/environments.py) loop
per-(transition, block) fusion contractions in the presweeps, the GMRES
geometric-sum operator, and the interior fills — the same op-count floor
the inner eigensolves had before algorithms/batched_fusion.py, and the
dominant cost of an SU(2) VUMPS iteration (~75% of wall-clock measured on
the CPU driver at bond 12).

This engine runs the whole refresh on channel-stacked environments
(mpo/su2_pack.py) through chained :class:`FusionDotPlan` stages:

* one-site MPO transfers (presweeps + interior fills) are three planned
  contractions, mirroring the dict path of
  ``environments.mpo_transfer_left/right``;
* channel pinning between cell sweeps (INIT := I0, FINAL := 0) becomes a
  static per-class mask multiply + add on the stacked arrays;
* the regularized geometric-sum operator runs on a packed (bra, ket,
  trivial-channel) vector with the rank-1 energy correction evaluated by a
  planned full pairing — one jitted program per GMRES restart;
* results unpack to the per-channel dicts the rest of the stack consumes
  in one traced slicing pass.

Everything is exact: plans replay the identical cached recoupling
projections the dict path computes (validated block-for-block in
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


class EnvLayoutSU2:
    """Bucketed layout of one bond's channel-stacked 3-leg environment."""

    def __init__(self, tmpl3: FusionTensor, Cch: int, dtype):
        self.struct = OperandStruct.of(tmpl3, use_allowed=True)
        self.stacks = build_stacks(self.struct, dtype, fixed_axes={2: Cch})
        self.dtype = dtype
        self.Cch = Cch

    def pack(self, t3: FusionTensor):
        return self.stacks.fill(self.stacks.zeros(), t3.blocks)

    def mask_drop(self, cmap, drop) -> Dict:
        """Per-class multiplicative masks zeroing the given channels."""
        out = {}
        for ck in self.stacks.class_keys:
            n = len(self.stacks.classes[ck])
            m = np.ones((n,) + ck, dtype=jnp.dtype(self.dtype).name)
            for i, key in enumerate(self.stacks.classes[ck]):
                chsec = key[0][2]
                for a in drop:
                    qa, oa = cmap.slot[a]
                    if qa == chsec:
                        m[i, :, :, oa] = 0.0
            out[ck] = jnp.asarray(m)
        return out


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


class ChannelBridge:
    """Static gather between one channel of a GL/GR layout and an X layout
    (and back): extract the FINAL/INIT channel for the geometric-sum solve,
    inject the solution."""

    def __init__(self, env_lay: EnvLayoutSU2, x_lay: XLayoutSU2, cmap,
                 channel: int):
        qa, oa = cmap.slot[channel]
        self.pairs = []  # (env class, env idx, x class, x idx, oa)
        for xk, (xck, xi) in x_lay.stacks.pos.items():
            legs, c, t = xk
            ekey = ((legs[0], legs[1], qa), c, t)
            if ekey not in env_lay.stacks.pos:
                continue
            eck, ei = env_lay.stacks.pos[ekey]
            self.pairs.append((eck, ei, xck, xi, oa))
        self.env_lay, self.x_lay = env_lay, x_lay

    def extract(self, env_arrays: Dict) -> Dict:
        out = {ck: jnp.zeros((len(self.x_lay.stacks.classes[ck]),) + ck,
                             dtype=self.x_lay.dtype)
               for ck in self.x_lay.stacks.class_keys}
        for eck, ei, xck, xi, oa in self.pairs:
            val = env_arrays[eck][ei, :, :, oa]
            out[xck] = out[xck].at[xi, :val.shape[0], :val.shape[1], 0].set(
                val[:xck[0], :xck[1]])
        return out

    def inject(self, env_arrays: Dict, x_arrays: Dict) -> Dict:
        env_arrays = dict(env_arrays)
        for eck, ei, xck, xi, oa in self.pairs:
            val = x_arrays[xck][xi, :, :, 0]
            env_arrays[eck] = env_arrays[eck].at[
                ei, :val.shape[0], :val.shape[1], oa].set(
                val[:eck[0], :eck[1]])
        return env_arrays


class MPOTransferSU2:
    """One-site channel-stacked MPO transfer as three chained plans."""

    def __init__(self, lay_in: EnvLayoutSU2, W4: FusionTensor,
                 A: FusionTensor, lay_out: EnvLayoutSU2, left: bool):
        dtype = lay_in.dtype
        C = lay_in.Cch
        a_struct = OperandStruct.of(A, use_allowed=True)
        Abar = A.conj()
        abar_struct = OperandStruct.of(Abar, use_allowed=True)
        self.a_stacks = build_stacks(a_struct, dtype, exact_axes={1})
        self.abar_stacks = build_stacks(abar_struct, dtype, exact_axes={1})
        w_struct = OperandStruct.of(W4, use_allowed=False)
        self.w = build_stacks(w_struct, dtype, fixed_axes={0: C, 3: C},
                              exact_axes={1, 2})
        self.Wp = self.w.fill(self.w.zeros(), {
            k: jnp.asarray(np.asarray(b), dtype=dtype)
            for k, b in W4.blocks.items()})
        g = A.group
        if left:
            # Y1 = GL3 . A -> (bra, ch, p, k'); Y2 = W4 . Y1 ->
            # (pO, chb, bra, k'); out = (Abar . Y2)^T(0,2,1) -> (b', k', chb)
            self.p1 = FusionDotPlan(lay_in.struct, a_struct, ([1], [0]),
                                    lay_in.stacks, self.a_stacks)
            y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                               sorted(self.p1.out_stacks.pos.keys()))
            self.p2 = FusionDotPlan(w_struct, y1, ([0, 2], [1, 2]),
                                    self.w, self.p1.out_stacks)
            y2 = OperandStruct(g, self.p2.out_spaces, self.p2.out_arrows,
                               sorted(self.p2.out_stacks.pos.keys()))
            self.p3 = FusionDotPlan(abar_struct, y2, ([0, 1], [2, 0]),
                                    self.abar_stacks, self.p2.out_stacks,
                                    out_stacks=lay_out.stacks,
                                    out_perm=(0, 2, 1))
        else:
            # Y1 = A . GR3 -> (vl, p, bra, ch); Y2 = W4 . Y1 ->
            # (cha, pO, vl, bra); out = (Y2 . Abar)^T(1,2,0) ->
            # (ket', bra', cha)
            self.p1 = FusionDotPlan(a_struct, lay_in.struct, ([2], [0]),
                                    self.a_stacks, lay_in.stacks)
            y1 = OperandStruct(g, self.p1.out_spaces, self.p1.out_arrows,
                               sorted(self.p1.out_stacks.pos.keys()))
            self.p2 = FusionDotPlan(w_struct, y1, ([3, 2], [3, 1]),
                                    self.w, self.p1.out_stacks)
            y2 = OperandStruct(g, self.p2.out_spaces, self.p2.out_arrows,
                               sorted(self.p2.out_stacks.pos.keys()))
            self.p3 = FusionDotPlan(y2, abar_struct, ([1, 3], [1, 2]),
                                    self.p2.out_stacks, self.abar_stacks,
                                    out_stacks=lay_out.stacks,
                                    out_perm=(1, 2, 0))
        self.left = left

    def pack_A(self, A: FusionTensor):
        Abar = A.conj()
        return (self.a_stacks.fill(self.a_stacks.zeros(), A.blocks),
                self.abar_stacks.fill(self.abar_stacks.zeros(), Abar.blocks))

    def apply(self, env_arrays: Dict, a_arrays, abar_arrays) -> Dict:
        if self.left:
            Y1 = self.p1.apply(env_arrays, a_arrays)
            Y2 = self.p2.apply(self.Wp, Y1)
            return self.p3.apply(abar_arrays, Y2)
        Y1 = self.p1.apply(a_arrays, env_arrays)
        Y2 = self.p2.apply(self.Wp, Y1)
        return self.p3.apply(Y2, abar_arrays)


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


def _unpack_env_dict(lay: EnvLayoutSU2, cmap, arrays: Dict, group,
                     V, arrows, dtype) -> Dict[int, FusionTensor]:
    """Stacked arrays -> the per-channel dict the rest of the stack uses."""
    from ..ops.sites_su2 import channel_space
    out: Dict[int, FusionTensor] = {}
    for a, (qa, oa) in enumerate(cmap.slot):
        blocks = {}
        for key, (ck, i) in lay.stacks.pos.items():
            legs, c, t = key
            if legs[2] != qa:
                continue
            db, dk, _ = lay.stacks.dims[key]
            blocks[key] = arrays[ck][i, :db, :dk, oa:oa + 1]
        out[a] = FusionTensor(group, (V, V, channel_space(group, qa)),
                              arrows, blocks, None, dtype)
    return out


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
        key = (id(H),
               tuple(a.structure() for a in psi.ALs),
               tuple(a.structure() for a in psi.ARs),
               str(psi.ALs[0].dtype))
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

        from ..mpo.su2_pack import PackedMPOSU2
        from ..mps.imps import bond_identity

        T = psi.T
        g = psi.group
        dtype = psi.ALs[0].dtype
        self.T, self.group, self.dtype = T, g, dtype
        self._rdt = jnp.real(jnp.zeros((), dtype)).dtype
        pm2 = PackedMPOSU2(H)
        self.pm2 = pm2
        self.cmaps = pm2.maps
        Cch = max(max(d for _, d in m.space) for m in pm2.maps)
        self.n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
        self.fin = H.idx_final(0)

        VL = [psi.ALs[x].spaces[0] for x in range(T)]   # bond left of x
        VR = [psi.ARs[x].spaces[2] for x in range(T)]   # bond right of x
        zeros = FusionTensor.zeros

        # ---- left ----
        self.lay_gl = [EnvLayoutSU2(
            zeros(g, (VL[x], VL[x], pm2.maps[x].space), (IN, OUT, IN),
                  dtype=dtype, fill=False), Cch, dtype) for x in range(T)]
        self.tplL = [MPOTransferSU2(self.lay_gl[x], pm2.Ws[x], psi.ALs[x],
                                    self.lay_gl[(x + 1) % T], left=True)
                     for x in range(T)]
        xtmplL = [zeros(g, (VL[x], VL[x], Space(g, {g.trivial: 1})),
                        (IN, OUT, IN), dtype=dtype, fill=False)
                  for x in range(T)]
        self.xlayL = [XLayoutSU2(xtmplL[x], dtype) for x in range(T)]
        self.cellL = [CellTransferSU2(self.xlayL[x], psi.ALs[x],
                                      self.xlayL[(x + 1) % T], True,
                                      self.tplL[x].a_stacks,
                                      self.tplL[x].abar_stacks)
                      for x in range(T)]
        self.bridge0L = ChannelBridge(self.lay_gl[0], self.xlayL[0],
                                      self.cmaps[0], 0)
        self.bridgeFL = ChannelBridge(self.lay_gl[0], self.xlayL[0],
                                      self.cmaps[0], self.fin)
        rho3_tmpl = zeros(g, (VL[0], VL[0], Space(g, {g.trivial: 1})),
                          (IN, OUT, OUT), dtype=dtype, fill=False)
        self.pairL = PairPlanSU2(self.xlayL[0], rho3_tmpl, x_first=True)
        self.maskL = self.lay_gl[0].mask_drop(self.cmaps[0], {0, self.fin})
        I0L = append_trivial_leg(bond_identity(g, VL[0], dtype=dtype), IN)
        self.i0xL = self.xlayL[0].pack_vec(I0L)
        z = {ck: jnp.zeros((len(self.lay_gl[0].stacks.classes[ck]),) + ck,
                           dtype=dtype)
             for ck in self.lay_gl[0].stacks.class_keys}
        self.i0envL = self.bridge0L.inject(
            z, self.xlayL[0].unflatten(self.i0xL))

        # ---- right ----
        self.lay_gr = [EnvLayoutSU2(
            zeros(g, (VR[x], VR[x], pm2.maps[(x + 1) % T].space),
                  (IN, OUT, OUT), dtype=dtype, fill=False), Cch, dtype)
            for x in range(T)]
        self.tplR = [MPOTransferSU2(self.lay_gr[x], pm2.Ws[x], psi.ARs[x],
                                    self.lay_gr[(x - 1) % T], left=False)
                     for x in range(T)]
        xtmplR = [zeros(g, (VR[x], VR[x], Space(g, {g.trivial: 1})),
                        (IN, OUT, OUT), dtype=dtype, fill=False)
                  for x in range(T)]
        self.xlayR = [XLayoutSU2(xtmplR[x], dtype) for x in range(T)]
        self.cellR = [CellTransferSU2(self.xlayR[x], psi.ARs[x],
                                      self.xlayR[(x - 1) % T], False,
                                      self.tplR[x].a_stacks,
                                      self.tplR[x].abar_stacks)
                      for x in range(T)]
        finR = len(self.cmaps[0].charges) - 1
        self.bridge0R = ChannelBridge(self.lay_gr[T - 1], self.xlayR[T - 1],
                                      self.cmaps[0], 0)
        self.bridgeFR = ChannelBridge(self.lay_gr[T - 1], self.xlayR[T - 1],
                                      self.cmaps[0], finR)
        sig3_tmpl = zeros(g, (VR[T - 1], VR[T - 1],
                              Space(g, {g.trivial: 1})),
                          (IN, OUT, IN), dtype=dtype, fill=False)
        self.pairR = PairPlanSU2(self.xlayR[T - 1], sig3_tmpl, x_first=False)
        self.maskR = self.lay_gr[T - 1].mask_drop(self.cmaps[0], {0, finR})
        I0R = append_trivial_leg(bond_identity(g, VR[T - 1], dtype=dtype),
                                 OUT)
        self.i0xR = self.xlayR[T - 1].pack_vec(I0R)
        zr = {ck: jnp.zeros((len(self.lay_gr[T - 1].stacks.classes[ck]),)
                            + ck, dtype=dtype)
              for ck in self.lay_gr[T - 1].stacks.class_keys}
        self.i0envR = self.bridgeFR.inject(
            zr, self.xlayR[T - 1].unflatten(self.i0xR))

        self.VL, self.VR = VL, VR
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        T = self.T

        def sweep_left(a_ab, rho_arrays):
            cur = self.i0envL
            for _ in range(self.n_sweeps):
                nxt = cur
                for x in range(T):
                    nxt = self.tplL[x].apply(nxt, *a_ab[x])
                nxt = {ck: nxt[ck] * self.maskL[ck] + self.i0envL[ck]
                       for ck in nxt}
                cur = nxt
            fill = cur
            for x in range(T):
                fill = self.tplL[x].apply(fill, *a_ab[x])
            cfx = self.bridgeFL.extract(fill)
            tr = self.pairL.value(self.xlayL[0].unflatten(self.i0xL),
                                  rho_arrays)
            e = self.pairL.value(cfx, rho_arrays) / tr
            rhs = self.xlayL[0].flatten(cfx) - e * self.i0xL
            return cur, rhs, e, tr

        def regL_mv(v, a_ab, rho_arrays, tr):
            X = self.xlayL[0].unflatten(v)
            for x in range(T):
                X = self.cellL[x].apply(X, *a_ab[x])
            ty = self.xlayL[0].flatten(X)
            corr = self.pairL.value(self.xlayL[0].unflatten(v),
                                    rho_arrays) / tr
            return v - ty + corr * self.i0xL

        def gmresL(x0, rhs, a_ab, rho_arrays, tr, atol):
            from ..solvers.krylov import _gmres_restart_core
            x, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, a_ab, rho_arrays, tr), x0, rhs, 30,
                atol=atol)
            return x, resid

        def finalize_left(cur, y, a_ab):
            GL0 = self.bridgeFL.inject(cur, self.xlayL[0].unflatten(y))
            envs = [GL0]
            for x in range(T - 1):
                envs.append(self.tplL[x].apply(envs[-1], *a_ab[x]))
            return [
                _unpack_env_dict(self.lay_gl[x], self.cmaps[x], envs[x],
                                 self.group, self.VL[x], (IN, OUT, IN),
                                 self.dtype)
                for x in range(T)]

        def sweep_right(a_ab, sig_arrays):
            cur = self.i0envR
            for _ in range(self.n_sweeps):
                nxt = cur
                for x in reversed(range(T)):
                    nxt = self.tplR[x].apply(nxt, *a_ab[x])
                nxt = {ck: nxt[ck] * self.maskR[ck] + self.i0envR[ck]
                       for ck in nxt}
                cur = nxt
            fill = cur
            for x in reversed(range(T)):
                fill = self.tplR[x].apply(fill, *a_ab[x])
            cix = self.bridge0R.extract(fill)
            tr = self.pairR.value(self.xlayR[T - 1].unflatten(self.i0xR),
                                  sig_arrays)
            e = self.pairR.value(cix, sig_arrays) / tr
            rhs = self.xlayR[T - 1].flatten(cix) - e * self.i0xR
            return cur, rhs, e, tr

        def regR_mv(v, a_ab, sig_arrays, tr):
            X = self.xlayR[T - 1].unflatten(v)
            for x in reversed(range(T)):
                X = self.cellR[x].apply(X, *a_ab[x])
            ty = self.xlayR[T - 1].flatten(X)
            corr = self.pairR.value(self.xlayR[T - 1].unflatten(v),
                                    sig_arrays) / tr
            return v - ty + corr * self.i0xR

        def gmresR(x0, rhs, a_ab, sig_arrays, tr, atol):
            from ..solvers.krylov import _gmres_restart_core
            x, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, a_ab, sig_arrays, tr), x0, rhs, 30,
                atol=atol)
            return x, resid

        def finalize_right(cur, y, a_ab):
            GR0 = self.bridge0R.inject(cur, self.xlayR[T - 1].unflatten(y))
            envs = [None] * T
            envs[T - 1] = GR0
            for x in reversed(range(1, T)):
                envs[x - 1] = self.tplR[x].apply(envs[x], *a_ab[x])
            return [
                _unpack_env_dict(self.lay_gr[x], self.cmaps[(x + 1) % T],
                                 envs[x], self.group, self.VR[x],
                                 (IN, OUT, OUT), self.dtype)
                for x in range(T)]

        def refresh_left(a_ab, rho_arrays, x0, tol_s):
            """Whole left refresh (presweep + ONE early-exiting <=30-step
            GMRES restart + fills + dict unpack) as a single program: over
            the TPU tunnel, host-sequenced sub-stage dispatches cost far
            more than the compute (65.8 -> ~10 ms at dense chi~2874, bench
            round 2); warm-started steady-state solves exit the device
            GMRES loop after a few matvecs."""
            cur, rhs, e, tr = sweep_left(a_ab, rho_arrays)
            from ..solvers.krylov import _gmres_restart_core
            y, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, a_ab, rho_arrays, tr), x0, rhs, 30,
                atol=tol_s * jnp.linalg.norm(rhs))
            GLs = finalize_left(cur, y, a_ab)
            return GLs, e, y, resid, rhs, cur, tr

        def refresh_right(a_ab, sig_arrays, x0, tol_s):
            cur, rhs, e, tr = sweep_right(a_ab, sig_arrays)
            from ..solvers.krylov import _gmres_restart_core
            y, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, a_ab, sig_arrays, tr), x0, rhs, 30,
                atol=tol_s * jnp.linalg.norm(rhs))
            GRs = finalize_right(cur, y, a_ab)
            return GRs, e, y, resid, rhs, cur, tr

        self._sweep_left = jax.jit(sweep_left)
        self._gmresL = jax.jit(gmresL)
        self._finalize_left = jax.jit(finalize_left)
        self._sweep_right = jax.jit(sweep_right)
        self._gmresR = jax.jit(gmresR)
        self._finalize_right = jax.jit(finalize_right)
        self._refresh_left = jax.jit(refresh_left)
        self._refresh_right = jax.jit(refresh_right)

    # ------------------------------------------------------------------
    def left(self, psi, H, tol: float, gl_final0=None):
        from .environments import rho_right
        T = self.T
        a_ab = [self.tplL[x].pack_A(psi.ALs[x]) for x in range(T)]
        rho3 = append_trivial_leg(rho_right(psi.Cs[T - 1]), OUT)
        rho_arrays = self.pairL.pack_r(rho3)
        x0 = (self.xlayL[0].pack_vec(gl_final0)
              if gl_final0 is not None
              and gl_final0.spaces[:2] == (self.VL[0], self.VL[0])
              else jnp.zeros((self.xlayL[0].total,), dtype=self.dtype))
        GLs, e, x, resid, rhs, cur, tr = self._refresh_left(
            a_ab, rho_arrays, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            # extra warm-started restarts until the host-checked tol holds
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresL(x, rhs, a_ab, rho_arrays, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GLs = self._finalize_left(cur, x, a_ab)
        return GLs, e

    def right(self, psi, H, tol: float, gr_init0=None):
        from .environments import rho_left
        T = self.T
        a_ab = [self.tplR[x].pack_A(psi.ARs[x]) for x in range(T)]
        sig3 = append_trivial_leg(rho_left(psi.Cs[T - 1]), IN)
        sig_arrays = self.pairR.pack_r(sig3)
        x0 = (self.xlayR[T - 1].pack_vec(gr_init0)
              if gr_init0 is not None
              and gr_init0.spaces[:2] == (self.VR[T - 1], self.VR[T - 1])
              else jnp.zeros((self.xlayR[T - 1].total,), dtype=self.dtype))
        GRs, e, x, resid, rhs, cur, tr = self._refresh_right(
            a_ab, sig_arrays, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresR(x, rhs, a_ab, sig_arrays, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GRs = self._finalize_right(cur, x, a_ab)
        return GRs, e
