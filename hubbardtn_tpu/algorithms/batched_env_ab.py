"""Fully-batched abelian environment refresh.

The abelian environment fixed points (algorithms/environments.py) already
run the GMRES geometric sums on bucketed stacks (batched_env.py), but the
presweeps and interior fills still issue one small GEMM chain per
(FSM transition, sector block) — the largest stage of the chi~2752 TPU
iteration (envs 6.2 ms of 11.1, bench.py).  This engine mirrors the SU(2)
:class:`~hubbardtn_tpu.algorithms.batched_env_su2.SU2EnvEngine` at the
abelian level (reference behavior: MPSKit ``environments``, call sites
/root/reference/src/HubbardFunctions.jl:1017,1027,1205-1208):

* environments ride the channel-packed 3-leg form of mpo/channel_pack.py
  (GL3 = (bra, ket, ch IN), GR3 = (ket, bra, ch OUT), neutral), stacked
  into pow2 shape buckets with a fixed channel axis;
* one-site MPO transfers (presweeps + interior fills) are three batched
  einsums per site with static gather plans — the same program shape as
  the H_AC matvec (algorithms/batched_hac.py);
* channel pinning between cell sweeps (INIT := I0, FINAL := 0) is a
  static mask multiply + add on the stacks;
* the regularized geometric sum reuses the bucketed cell-transfer plans
  of batched_env.py, with the whole presweep + early-exiting GMRES
  restart + fills fused into ONE jitted program (over the TPU tunnel,
  host-sequenced sub-stage dispatches cost more than the compute);
* results unpack to the per-channel dicts the rest of the stack consumes.

Pads are zero on every operand, so results are exact up to batched-GEMM
summation order (validated against the dict path in
tests/test_batched_env_ab.py).  Opt out with HTN_NO_ENV_PACK=1.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mpo.channel_pack import PackedMPO
from ..mps.imps import bond_identity
from ..tensor.symtensor import IN, OUT, SymTensor
from .batched_env import RegLeftPackedPlan, RegRightPackedPlan, XLayout
from .batched_hac import _Stacks, PaddedHAC


class EnvLayoutAb:
    """Bucketed stack layout of one bond's channel-packed 3-leg env."""

    def __init__(self, tmpl3: SymTensor, Cch: int, dtype):
        keys = sorted(tmpl3.allowed_keys())
        dims = [tuple(tmpl3.spaces[i].dim_of(k[i]) for i in range(3))
                for k in keys]
        self.stacks = _Stacks(keys, dims, dtype, fixed_axes={2: Cch})
        self.dtype = dtype
        self.Cch = Cch
        self.spaces = tmpl3.spaces

    def zeros(self):
        return self.stacks.zeros()

    def mask_drop(self, cmap, drop) -> Dict:
        """Per-class multiplicative masks zeroing the given channels."""
        rdt = jnp.real(jnp.zeros((), self.dtype)).dtype
        out = {}
        for ck in self.stacks.class_keys:
            n = len(self.stacks.classes[ck])
            m = np.ones((n,) + ck, dtype=jnp.dtype(rdt).name)
            for i, key in enumerate(self.stacks.classes[ck]):
                for a in drop:
                    qa, oa = cmap.slot[a]
                    if qa == key[2]:
                        m[i, :, :, oa] = 0.0
            out[ck] = jnp.asarray(m)
        return out


class ChannelBridgeAb:
    """Static gather between one (neutral) channel of an env layout and the
    flat GMRES-variable layout (batched_env.XLayout): extract the
    FINAL/INIT channel for the geometric-sum solve, inject the solution."""

    def __init__(self, env_lay: EnvLayoutAb, x_lay: XLayout, cmap,
                 channel: int):
        qa, oa = cmap.slot[channel]
        self.pairs = []  # (env class, env idx, x class, x idx, oa)
        for q, (xck, xi) in x_lay.pos.items():
            ekey = (q, q, qa)
            if ekey not in env_lay.stacks.pos:
                continue
            eck, ei = env_lay.stacks.pos[ekey]
            self.pairs.append((eck, ei, xck, xi, oa))
        self.env_lay, self.x_lay = env_lay, x_lay

    def extract(self, env_arrays: Dict) -> Dict:
        out = {ck: jnp.zeros((len(self.x_lay.classes[ck]), ck, ck),
                             dtype=self.x_lay.dtype)
               for ck in self.x_lay.class_keys}
        for eck, ei, xck, xi, oa in self.pairs:
            val = env_arrays[eck][ei, :xck, :xck, oa]
            out[xck] = out[xck].at[xi].set(val)
        return out

    def inject(self, env_arrays: Dict, x_arrays: Dict) -> Dict:
        env_arrays = dict(env_arrays)
        for eck, ei, xck, xi, oa in self.pairs:
            val = x_arrays[xck][xi]
            env_arrays[eck] = env_arrays[eck].at[
                ei, :xck, :xck, oa].set(val)
        return env_arrays


class MPOTransferAb:
    """One-site channel-packed abelian MPO transfer on bucketed stacks.

    left:  GL3' = sum A^dag . W . (GL3 . A)   (env moves bond x -> x+1)
    right: GR3' = sum (A . GR3) . W . A^dag   (env moves bond x -> x-1)

    A stacks come from the cell-transfer ALayout (batched_env.ALayout) so
    one packing serves both the MPO transfers and the geometric sums; the
    conjugate copy is taken at apply time (gathered slices are conjugated
    in-kernel, fused by XLA).
    """

    def __init__(self, lay_in: EnvLayoutAb, W4: SymTensor, alay,
                 lay_out: EnvLayoutAb, left: bool):
        from collections import defaultdict
        dtype = lay_in.dtype
        C = lay_in.Cch
        self.left = left
        self.dtype = dtype

        w_keys = sorted(W4.blocks.keys())
        for k in w_keys:
            if (np.iscomplexobj(np.asarray(W4.blocks[k]))
                    and jnp.dtype(dtype).kind != "c"):
                raise TypeError(
                    "complex MPO block with a real state dtype: promote the "
                    "MPS to complex before using the batched env engine")
        w_dims = [tuple(W4.spaces[i].dim_of(k[i]) for i in range(4))
                  for k in w_keys]
        self.w = _Stacks(w_keys, w_dims, dtype,
                         fixed_axes={0: C, 3: C}, exact_axes={1, 2})
        self.Wp = self.w.fill(self.w.zeros(), W4.blocks)

        env_keys = sorted(lay_in.stacks.pos.keys())
        a_keys = alay.keys

        def group(combos):
            plan = defaultdict(list)
            for ckey, idx in combos:
                plan[ckey].append(idx)
            return {k: tuple(jnp.asarray(col, dtype=jnp.int32)
                             for col in zip(*rows))
                    for k, rows in plan.items()}

        if left:
            # stage 1: Y1[(b, qa, pi, r)] = GL[(b, k, qa)] . A[(k, pi, r)]
            o1_pos: Dict = {}
            o1_counts: Dict[Tuple, int] = defaultdict(int)
            combos1 = []
            for gk in env_keys:
                b, kq, qa = gk
                for ak in a_keys:
                    if ak[0] != kq:
                        continue
                    o1 = (b, qa, ak[1], ak[2])
                    gck, gi = lay_in.stacks.pos[gk]
                    ack, ai = alay.pos[ak]
                    yck = (gck[0], C, ack[1], ack[2])
                    o1_pos[o1] = (yck, o1_counts[yck])
                    o1_counts[yck] += 1
                    combos1.append(((gck, ack, yck), (gi, ai, o1_pos[o1][1])))
            self.plan1 = group(combos1)
            self.y1_shape = dict(o1_counts)

            # stage 2: Y2[(b, po, qb, r)] += Y1 . W over (qa, pi)
            o2_pos: Dict = {}
            o2_counts: Dict[Tuple, int] = defaultdict(int)
            combos2 = []
            for o1, (yck, yi) in o1_pos.items():
                b, qa, pi, r = o1
                for wk in w_keys:
                    if wk[0] != qa or wk[2] != pi:
                        continue
                    wck, wi = self.w.pos[wk]
                    o2 = (b, wk[1], wk[3], r)
                    zck = (yck[0], wck[1], C, yck[3])
                    if o2 not in o2_pos:
                        o2_pos[o2] = (zck, o2_counts[zck])
                        o2_counts[zck] += 1
                    combos2.append(((yck, wck, zck), (yi, wi, o2_pos[o2][1])))
            self.plan2 = group(combos2)
            self.y2_shape = dict(o2_counts)

            # stage 3: out[(s, r, qb)] += conj(A)[(b, po, s)] . Y2[(b,po,qb,r)]
            combos3 = []
            for o2, (zck, zi) in o2_pos.items():
                b, po, qb, r = o2
                for ak in a_keys:
                    if ak[0] != b or ak[1] != po:
                        continue
                    ok = (ak[2], r, qb)
                    if ok not in lay_out.stacks.pos:
                        continue
                    ock, oi = lay_out.stacks.pos[ok]
                    ack, ai = alay.pos[ak]
                    combos3.append(((zck, ack, ock), (zi, ai, oi)))
            self.plan3 = group(combos3)
        else:
            # stage 1: Y1[(l, p, s, qc)] = A[(l, p, r)] . GR[(r, s, qc)]
            o1_pos = {}
            o1_counts = defaultdict(int)
            combos1 = []
            for ak in a_keys:
                l, p, r = ak
                for gk in env_keys:
                    if gk[0] != r:
                        continue
                    o1 = (l, p, gk[1], gk[2])
                    ack, ai = alay.pos[ak]
                    gck, gi = lay_in.stacks.pos[gk]
                    yck = (ack[0], ack[1], gck[1], C)
                    o1_pos[o1] = (yck, o1_counts[yck])
                    o1_counts[yck] += 1
                    combos1.append(((ack, gck, yck), (ai, gi, o1_pos[o1][1])))
            self.plan1 = group(combos1)
            self.y1_shape = dict(o1_counts)

            # stage 2: Y2[(l, qa, po, s)] += Y1 . W over (pi=p, qb=qc)
            o2_pos = {}
            o2_counts = defaultdict(int)
            combos2 = []
            for o1, (yck, yi) in o1_pos.items():
                l, p, s, qc = o1
                for wk in w_keys:
                    if wk[2] != p or wk[3] != qc:
                        continue
                    wck, wi = self.w.pos[wk]
                    o2 = (l, wk[0], wk[1], s)
                    zck = (yck[0], C, wck[1], yck[2])
                    if o2 not in o2_pos:
                        o2_pos[o2] = (zck, o2_counts[zck])
                        o2_counts[zck] += 1
                    combos2.append(((yck, wck, zck), (yi, wi, o2_pos[o2][1])))
            self.plan2 = group(combos2)
            self.y2_shape = dict(o2_counts)

            # stage 3: out[(l, j, qa)] += Y2[(l,qa,po,s)] . conj(A)[(j,po,s)]
            combos3 = []
            for o2, (zck, zi) in o2_pos.items():
                l, qa, po, s = o2
                for ak in a_keys:
                    if ak[1] != po or ak[2] != s:
                        continue
                    ok = (l, ak[0], qa)
                    if ok not in lay_out.stacks.pos:
                        continue
                    ock, oi = lay_out.stacks.pos[ok]
                    ack, ai = alay.pos[ak]
                    combos3.append(((zck, ack, ock), (zi, ai, oi)))
            self.plan3 = group(combos3)
        self.lay_out = lay_out

    def apply(self, env_arrays: Dict, astacks) -> Dict:
        dtype = self.dtype
        Y1 = {ck: jnp.zeros((n,) + ck, dtype=dtype)
              for ck, n in self.y1_shape.items()}
        if self.left:
            for (gck, ack, yck), (gi, ai, yi) in self.plan1.items():
                contrib = jnp.einsum("bikc,bkpr->bicpr",
                                     env_arrays[gck][gi], astacks[ack][ai])
                Y1[yck] = Y1[yck].at[yi].add(contrib)
        else:
            for (ack, gck, yck), (ai, gi, yi) in self.plan1.items():
                contrib = jnp.einsum("blpr,brsc->blpsc",
                                     astacks[ack][ai], env_arrays[gck][gi])
                Y1[yck] = Y1[yck].at[yi].add(contrib)

        Y2 = {ck: jnp.zeros((n,) + ck, dtype=dtype)
              for ck, n in self.y2_shape.items()}
        if self.left:
            for (yck, wck, zck), (yi, wi, zi) in self.plan2.items():
                contrib = jnp.einsum("bicpr,bcqpd->biqdr",
                                     Y1[yck][yi], self.Wp[wck][wi])
                Y2[zck] = Y2[zck].at[zi].add(contrib)
        else:
            for (yck, wck, zck), (yi, wi, zi) in self.plan2.items():
                contrib = jnp.einsum("blpsc,bdqpc->bldqs",
                                     Y1[yck][yi], self.Wp[wck][wi])
                Y2[zck] = Y2[zck].at[zi].add(contrib)

        out = {ck: jnp.zeros((len(self.lay_out.stacks.classes[ck]),) + ck,
                             dtype=dtype)
               for ck in self.lay_out.stacks.class_keys}
        if self.left:
            for (zck, ack, ock), (zi, ai, oi) in self.plan3.items():
                a = jnp.conj(astacks[ack][ai])
                contrib = jnp.einsum("biqdr,biqs->bsrd", Y2[zck][zi], a)
                out[ock] = out[ock].at[oi].add(contrib)
        else:
            for (zck, ack, ock), (zi, ai, oi) in self.plan3.items():
                a = jnp.conj(astacks[ack][ai])
                contrib = jnp.einsum("bldqs,bjqs->bljd", Y2[zck][zi], a)
                out[ock] = out[ock].at[oi].add(contrib)
        return out


def _unpack_env_dict_ab(lay: EnvLayoutAb, cmap, arrays: Dict, group,
                        V, charges_dual: bool, dtype
                        ) -> Dict[int, SymTensor]:
    """Stacked arrays -> the per-channel dict the rest of the stack uses
    (complete zero-filled block tables, matching environments._canon)."""
    out: Dict[int, SymTensor] = {}
    for a, (qa, oa) in enumerate(cmap.slot):
        blocks = {}
        for key, (ck, i) in lay.stacks.pos.items():
            if key[2] != qa:
                continue
            d0, d1, _ = lay.stacks.dims[key]
            blocks[(key[0], key[1])] = arrays[ck][i, :d0, :d1, oa]
        charge = group.dual(qa) if charges_dual else qa
        out[a] = SymTensor(group, (V, V), (IN, OUT), blocks, charge, dtype)
    return out


class AbEnvEngine:
    """Per-structure abelian environment refresh: presweeps, geometric-sum
    GMRES, and interior fills on bucketed channel-packed stacks.

    Built once per (H, MPS block structure); the jitted closures keep
    their compiled programs across VUMPS iterations at fixed structure."""

    _cache: Dict = {}
    _CACHE_MAX = 4

    @classmethod
    def get(cls, psi, H) -> "AbEnvEngine":
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
        T = psi.T
        g = psi.group
        dtype = psi.ALs[0].dtype
        self.T, self.group, self.dtype = T, g, dtype
        self._rdt = jnp.real(jnp.zeros((), dtype)).dtype
        pm = PackedMPO(H)
        self.pm = pm
        self.cmaps = pm.maps
        Cch = max(max(d for _, d in m.space) for m in pm.maps)
        self.n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
        self.fin = H.idx_final(0)
        self.finR = len(self.cmaps[0].charges) - 1

        VL = [psi.ALs[x].spaces[0] for x in range(T)]   # bond left of x
        VR = [psi.ARs[x].spaces[2] for x in range(T)]   # bond right of x
        self.VL, self.VR = VL, VR

        # ---- left ----
        self.regL = RegLeftPackedPlan(psi, dtype=dtype)
        self.lay_gl = [EnvLayoutAb(
            SymTensor.zeros(g, (VL[x], VL[x], pm.maps[x].space),
                            (IN, OUT, IN), fill=False), Cch, dtype)
            for x in range(T)]
        self.tplL = [MPOTransferAb(self.lay_gl[x], pm.Ws[x], self.regL.als[x],
                                   self.lay_gl[(x + 1) % T], left=True)
                     for x in range(T)]
        self.bridge0L = ChannelBridgeAb(self.lay_gl[0], self.regL.layout,
                                        self.cmaps[0], 0)
        self.bridgeFL = ChannelBridgeAb(self.lay_gl[0], self.regL.layout,
                                        self.cmaps[0], self.fin)
        self.maskL = self.lay_gl[0].mask_drop(self.cmaps[0], {0, self.fin})
        I0L = bond_identity(g, VL[0], dtype=dtype)
        self.i0xL = self.regL.layout.pack(I0L)
        self.i0envL = self.bridge0L.inject(
            self.lay_gl[0].zeros(), self.regL.layout.unflatten(self.i0xL))

        # ---- right ----
        self.regR = RegRightPackedPlan(psi, dtype=dtype)
        # GR at the bond right of x carries the channel set of bond x+1
        self.lay_gr = [EnvLayoutAb(
            SymTensor.zeros(g, (VR[x], VR[x], pm.maps[(x + 1) % T].space),
                            (IN, OUT, OUT), fill=False), Cch, dtype)
            for x in range(T)]
        self.tplR = [MPOTransferAb(self.lay_gr[x], pm.Ws[x], self.regR.ars[x],
                                   self.lay_gr[(x - 1) % T], left=False)
                     for x in range(T)]
        self.bridge0R = ChannelBridgeAb(self.lay_gr[T - 1], self.regR.layout,
                                        self.cmaps[0], 0)
        self.bridgeFR = ChannelBridgeAb(self.lay_gr[T - 1], self.regR.layout,
                                        self.cmaps[0], self.finR)
        self.maskR = self.lay_gr[T - 1].mask_drop(self.cmaps[0],
                                                  {0, self.finR})
        I0R = bond_identity(g, VR[T - 1], dtype=dtype)
        self.i0xR = self.regR.layout.pack(I0R)
        self.i0envR = self.bridgeFR.inject(
            self.lay_gr[T - 1].zeros(), self.regR.layout.unflatten(self.i0xR))

        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        T = self.T
        from ..solvers.krylov import _gmres_restart_core

        def sweep_left(astacks, rhoT_vec):
            cur = self.i0envL
            for _ in range(self.n_sweeps):
                nxt = cur
                for x in range(T):
                    nxt = self.tplL[x].apply(nxt, astacks[x])
                nxt = {ck: nxt[ck] * self.maskL[ck] + self.i0envL[ck]
                       for ck in nxt}
                cur = nxt
            fill = cur
            for x in range(T):
                fill = self.tplL[x].apply(fill, astacks[x])
            cf = self.regL.layout.flatten(self.bridgeFL.extract(fill))
            tr = jnp.sum(self.i0xL * rhoT_vec)
            e = jnp.sum(cf * rhoT_vec) / tr
            rhs = cf - e * self.i0xL
            return cur, rhs, e, tr

        def regL_mv(v, astacks, rhoT_vec, tr):
            return self.regL.matvec(v, astacks, rhoT_vec, self.i0xL, tr)

        def gmresL(x0, rhs, astacks, rhoT_vec, tr, atol):
            x, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, astacks, rhoT_vec, tr), x0, rhs, 30,
                atol=atol)
            return x, resid

        def finalize_left(cur, y, astacks):
            GL0 = self.bridgeFL.inject(cur, self.regL.layout.unflatten(y))
            envs = [GL0]
            for x in range(T - 1):
                envs.append(self.tplL[x].apply(envs[-1], astacks[x]))
            dicts = [
                _unpack_env_dict_ab(self.lay_gl[x], self.cmaps[x], envs[x],
                                    self.group, self.VL[x], False, self.dtype)
                for x in range(T)]
            return dicts, envs

        def refresh_left(astacks, rhoT_vec, x0, tol_s):
            """Whole left refresh (presweep + ONE early-exiting <=30-step
            GMRES restart + fills + dict unpack) as a single program; the
            host retries extra warm-started restarts only when needed."""
            cur, rhs, e, tr = sweep_left(astacks, rhoT_vec)
            y, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, astacks, rhoT_vec, tr), x0, rhs, 30,
                atol=tol_s * jnp.linalg.norm(rhs))
            GLs, stacks = finalize_left(cur, y, astacks)
            return GLs, stacks, e, y, resid, rhs, cur, tr

        def sweep_right(astacks, sigT_vec):
            cur = self.i0envR
            for _ in range(self.n_sweeps):
                nxt = cur
                for x in reversed(range(T)):
                    nxt = self.tplR[x].apply(nxt, astacks[x])
                nxt = {ck: nxt[ck] * self.maskR[ck] + self.i0envR[ck]
                       for ck in nxt}
                cur = nxt
            fill = cur
            for x in reversed(range(T)):
                fill = self.tplR[x].apply(fill, astacks[x])
            ci = self.regR.layout.flatten(self.bridge0R.extract(fill))
            tr = jnp.sum(sigT_vec * self.i0xR)
            e = jnp.sum(sigT_vec * ci) / tr
            rhs = ci - e * self.i0xR
            return cur, rhs, e, tr

        def regR_mv(v, astacks, sigT_vec, tr):
            return self.regR.matvec(v, astacks, sigT_vec, self.i0xR, tr)

        def gmresR(x0, rhs, astacks, sigT_vec, tr, atol):
            x, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, astacks, sigT_vec, tr), x0, rhs, 30,
                atol=atol)
            return x, resid

        def finalize_right(cur, y, astacks):
            GR0 = self.bridge0R.inject(cur, self.regR.layout.unflatten(y))
            envs = [None] * T
            envs[T - 1] = GR0
            for x in reversed(range(1, T)):
                envs[x - 1] = self.tplR[x].apply(envs[x], astacks[x])
            dicts = [
                _unpack_env_dict_ab(self.lay_gr[x], self.cmaps[(x + 1) % T],
                                    envs[x], self.group, self.VR[x], True,
                                    self.dtype)
                for x in range(T)]
            return dicts, envs

        def refresh_right(astacks, sigT_vec, x0, tol_s):
            cur, rhs, e, tr = sweep_right(astacks, sigT_vec)
            y, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, astacks, sigT_vec, tr), x0, rhs, 30,
                atol=tol_s * jnp.linalg.norm(rhs))
            GRs, stacks = finalize_right(cur, y, astacks)
            return GRs, stacks, e, y, resid, rhs, cur, tr

        self._gmresL = jax.jit(gmresL)
        self._finalize_left = jax.jit(finalize_left)
        self._refresh_left = jax.jit(refresh_left)
        self._gmresR = jax.jit(gmresR)
        self._finalize_right = jax.jit(finalize_right)
        self._refresh_right = jax.jit(refresh_right)

    # ------------------------------------------------------------------
    def left(self, psi, H, tol: float, gl_final0=None):
        """Returns (per-channel dicts, energy/cell, per-bond stacked arrays).

        The stacks share the dicts' layout (lay_gl[x]); vumps feeds them
        straight into layout-matched PaddedHAC/PaddedHC plans, skipping the
        per-iteration dict -> host -> stacks repack."""
        from .environments import rho_right
        T = self.T
        astacks = self.regL.pack_As(psi)
        rhoT_vec = self.regL.layout.pack_transposed(rho_right(psi.Cs[T - 1]))
        x0 = (self.regL.layout.pack(gl_final0)
              if gl_final0 is not None
              and gl_final0.spaces == (self.VL[0], self.VL[0])
              else jnp.zeros((self.regL.layout.total,), dtype=self.dtype))
        GLs, stacks, e, x, resid, rhs, cur, tr = self._refresh_left(
            astacks, rhoT_vec, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            # extra warm-started restarts until the host-checked tol holds
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresL(x, rhs, astacks, rhoT_vec, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GLs, stacks = self._finalize_left(cur, x, astacks)
        return GLs, e, stacks

    def right(self, psi, H, tol: float, gr_init0=None):
        from .environments import rho_left
        T = self.T
        astacks = self.regR.pack_As(psi)
        sigT_vec = self.regR.layout.pack_transposed(rho_left(psi.Cs[T - 1]))
        x0 = (self.regR.layout.pack(gr_init0)
              if gr_init0 is not None
              and gr_init0.spaces == (self.VR[T - 1], self.VR[T - 1])
              else jnp.zeros((self.regR.layout.total,), dtype=self.dtype))
        GRs, stacks, e, x, resid, rhs, cur, tr = self._refresh_right(
            astacks, sigT_vec, x0, jnp.asarray(tol, self._rdt))
        bnorm = float(jnp.linalg.norm(rhs))
        if bnorm > 0.0 and float(resid) / bnorm >= tol:
            atol = jnp.asarray(tol * bnorm, self._rdt)
            for _ in range(19):
                x, resid = self._gmresR(x, rhs, astacks, sigT_vec, tr, atol)
                if float(resid) / bnorm < tol:
                    break
            GRs, stacks = self._finalize_right(cur, x, astacks)
        return GRs, e, stacks
