"""Fused abelian environment refresh: one jitted program per side.

The abelian environment fixed points (algorithms/environments.py) run the
geometric-sum GMRES on bucketed stacks (batched_env.py), but compose the
stages (presweeps, two GMRES solves, interior fills) as host-sequenced
dispatches — over the tunneled TPU each dispatch costs an RPC, and the
Krylov restarts sync the host every iteration.  This engine fuses the
whole per-side refresh into ONE jitted program (reference behavior:
MPSKit ``environments``, call sites
/root/reference/src/HubbardFunctions.jl:1017,1027,1205-1208):

* presweeps and interior fills run the per-channel dict transfers
  (environments.mpo_transfer_left/right) traced inline: channels are
  pinned by static dict overwrites, so XLA's dead-code elimination prunes
  every chain that cannot reach a live output — the same FLOP profile as
  the host-composed path (a bucketed variant measured ~2.6x MORE compute:
  transfer GEMMs are already large, pow2 pad waste costs real FLOPs, and
  runtime channel masks block DCE);
* zero templates and the bond identity are created inside the trace, so
  the algebraic simplifier folds the template adds outright;
* the regularized geometric sum runs an early-exiting 30-step GMRES
  restart on the bucketed stacks of batched_env.py (warm-started from the
  previous VUMPS iteration via x0); the host retries extra warm restarts
  only when the device-tracked residual misses the tolerance;
* besides the per-channel dicts the rest of the stack consumes, the
  program also emits per-bond STACKED arrays in the eigensolver plans'
  exact layout (pow2 buckets, global channel pad), so vumps feeds them
  straight into layout-matched PaddedHAC/PaddedHC plans — the former
  per-iteration dict -> host -> stacks repack stage disappears.

Exactness: all transfers are the dict path itself (same contractions,
same order), validated in tests/test_batched_env_ab.py.  Opt out with
HTN_NO_ENV_PACK=1.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mpo.channel_pack import PackedMPO
from ..mps.imps import bond_identity
from ..tensor.symtensor import IN, OUT, SymTensor
from .batched_env import RegLeftPackedPlan, RegRightPackedPlan
from .batched_hac import _Stacks


class EnvLayoutAb:
    """Bucketed stack layout of one bond's channel-packed 3-leg env (the
    eigensolver plans' layout: pow2 bond buckets, fixed channel pad)."""

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


def _dict_pack_plan(lay: EnvLayoutAb, cmap) -> List[Tuple]:
    """Static plan: per-channel 2-leg dict blocks -> stacked class arrays.
    Entries (channel a, block key (b, k), class, index, (d0, d1), slot)."""
    plan = []
    for a, (qa, oa) in enumerate(cmap.slot):
        for key, (ck, i) in lay.stacks.pos.items():
            if key[2] != qa:
                continue
            d0, d1, _ = lay.stacks.dims[key]
            plan.append((a, (key[0], key[1]), ck, i, (d0, d1), oa))
    return plan


def _pack_env_stacks(lay: EnvLayoutAb, plan, Gdict) -> Dict:
    """Per-channel dicts -> the stacked layout (pure data movement)."""
    arrs = {ck: jnp.zeros((len(lay.stacks.classes[ck]),) + ck,
                          dtype=lay.dtype) for ck in lay.stacks.class_keys}
    for a, bk, ck, i, (d0, d1), oa in plan:
        blk = Gdict[a].blocks.get(bk)
        if blk is not None:
            arrs[ck] = arrs[ck].at[i, :d0, :d1, oa].set(
                blk.astype(lay.dtype))
    return arrs


class AbEnvEngine:
    """Per-structure abelian environment refresh: presweeps, geometric-sum
    GMRES, and interior fills as one jitted program per side.

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
        T = psi.T
        g = psi.group
        dtype = psi.ALs[0].dtype
        self.T, self.group, self.dtype = T, g, dtype
        self._rdt = jnp.real(jnp.zeros((), dtype)).dtype
        for W in H.Ws:
            for op in W.values():
                if (any(np.iscomplexobj(np.asarray(b))
                        for b in op.blocks.values())
                        and jnp.dtype(dtype).kind != "c"):
                    raise TypeError(
                        "complex MPO block with a real state dtype: promote "
                        "the MPS to complex before using the batched env "
                        "engine")
        pm = PackedMPO(H)
        self.pm = pm
        self.cmaps = pm.maps
        Cch = max(max(d for _, d in m.space) for m in pm.maps)
        self.n_sweeps = max(2, math.ceil(H.max_len / T) + 1)
        self.fin = H.idx_final(0)
        self.finR = len(self.cmaps[0].charges) - 1
        self.H = H
        self.charges = H.charges

        VL = [psi.ALs[x].spaces[0] for x in range(T)]   # bond left of x
        VR = [psi.ARs[x].spaces[2] for x in range(T)]   # bond right of x
        self.VL, self.VR = VL, VR

        # state-tensor structure for the in-jit rebuild from the GMRES
        # stacks (one packing serves the Krylov matvecs and the transfers)
        self.regL = RegLeftPackedPlan(psi, dtype=dtype)
        self.regR = RegRightPackedPlan(psi, dtype=dtype)
        self._al_meta = [(psi.ALs[x].spaces, psi.ALs[x].arrows)
                         for x in range(T)]
        self._ar_meta = [(psi.ARs[x].spaces, psi.ARs[x].arrows)
                         for x in range(T)]

        # eigensolver-plan layouts for the passthrough stacked outputs
        self.lay_gl = [EnvLayoutAb(
            SymTensor.zeros(g, (VL[x], VL[x], pm.maps[x].space),
                            (IN, OUT, IN), dtype=dtype, fill=False),
            Cch, dtype) for x in range(T)]
        self.lay_gr = [EnvLayoutAb(
            SymTensor.zeros(g, (VR[x], VR[x], pm.maps[(x + 1) % T].space),
                            (IN, OUT, OUT), dtype=dtype, fill=False),
            Cch, dtype) for x in range(T)]
        self._pkplan_gl = [_dict_pack_plan(self.lay_gl[x], pm.maps[x])
                           for x in range(T)]
        self._pkplan_gr = [_dict_pack_plan(self.lay_gr[x],
                                           pm.maps[(x + 1) % T])
                           for x in range(T)]

        # class-batched one-site MPO transfers for the presweeps/fills
        # (measured per-sector data-movement-bound on the dict path;
        # HTN_ENV_TRANSFER=dict restores the inline dict transfers)
        self.transfer_mode = os.environ.get("HTN_ENV_TRANSFER", "batched")
        if self.transfer_mode != "dict":
            from .batched_transfer import (PaddedTransferLeft,
                                           PaddedTransferRight)
            self.tplanL = [PaddedTransferLeft(
                self.lay_gl[x], pm.Ws[x], self.regL.als[x],
                self.lay_gl[(x + 1) % T]) for x in range(T)]
            self.tplanR = [PaddedTransferRight(
                self.lay_gr[x], pm.Ws[x], self.regR.ars[x],
                self.lay_gr[(x - 1) % T]) for x in range(T)]
            m0 = pm.maps[0]
            # left: channel 0 pinned to I0, FINAL channel zeroed/solved;
            # right: final channel pinned to I0, channel 0 zeroed/solved
            self._maskL, self._eyesL = self._pin_consts(
                self.lay_gl[0], m0, i0_channel=0,
                zero_channels=(0, self.fin))
            self._maskR, self._eyesR = self._pin_consts(
                self.lay_gr[T - 1], m0, i0_channel=self.finR,
                zero_channels=(0, self.finR))
            self._cfL = self._xl_plan(self.lay_gl[0], self.regL.layout,
                                      m0, self.fin)
            self._cfR = self._xl_plan(self.lay_gr[T - 1], self.regR.layout,
                                      m0, 0)

        self._build_jits()

    # ------------------------------------------------------------------
    def _pin_consts(self, lay: EnvLayoutAb, cmap, i0_channel: int,
                    zero_channels):
        """(mask consts, eye plan): ``pin(stk) = stk * mask``, then the
        eye plan writes the bond identity into the pinned channel — the
        stack-land form of the dict presweep's ``cur[0] = I0;
        cur[fin] = 0`` channel pinning.  Masks are tiny numpy constants;
        the identities are written in-trace (a full-size identity stack
        would embed an env-sized constant into every program)."""
        npdt = jnp.dtype(self.dtype).name
        qz = [cmap.slot[c] for c in zero_channels]
        qi, oi = cmap.slot[i0_channel]
        mask = {}
        eyes = []
        for ck in lay.stacks.class_keys:
            keys = lay.stacks.classes[ck]
            m = np.ones((len(keys), 1, 1, ck[2]), dtype=npdt)
            for i, key in enumerate(keys):
                for qc, oc in qz:
                    if key[2] == qc:
                        m[i, 0, 0, oc] = 0
                if key[2] == qi and key[0] == key[1]:
                    d0, d1, _ = lay.stacks.dims[key]
                    eyes.append((ck, i, d0, d1, oi))
            mask[ck] = m
        return mask, eyes

    def _pin(self, stk, mask, eyes):
        out = {ck: stk[ck] * jnp.asarray(mask[ck]) for ck in stk}
        for ck, i, d0, d1, oi in eyes:
            out[ck] = out[ck].at[i, :d0, :d1, oi].set(
                jnp.eye(d0, d1, dtype=self.dtype))
        return out

    def _pin_zeros(self, lay, mask, eyes):
        out = lay.zeros()
        for ck, i, d0, d1, oi in eyes:
            out[ck] = out[ck].at[i, :d0, :d1, oi].set(
                jnp.eye(d0, d1, dtype=self.dtype))
        return out

    @staticmethod
    def _xl_plan(lay: EnvLayoutAb, xl, cmap, channel: int):
        """Static gather/scatter plan between one boundary channel's
        diagonal blocks in the env stacks and the GMRES XLayout vector."""
        qc, oc = cmap.slot[channel]
        plan = []
        for ck in xl.class_keys:
            ents = []
            for i, q in enumerate(xl.classes[ck]):
                key = (q, q, qc)
                if key in lay.stacks.pos:
                    eck, j = lay.stacks.pos[key]
                    ents.append((i, xl.dims[q], eck, j, oc))
            plan.append((ck, len(xl.classes[ck]), ents))
        return plan

    def _gather_xl(self, plan, stk):
        parts = []
        for ck, n, ents in plan:
            buf = jnp.zeros((n, ck, ck), dtype=self.dtype)
            for i, d, eck, j, oc in ents:
                buf = buf.at[i, :d, :d].set(stk[eck][j, :d, :d, oc])
            parts.append(buf.reshape(-1))
        return jnp.concatenate(parts)

    def _scatter_xl(self, plan, stk, yvec, xl):
        Y = xl.unflatten(yvec)
        out = dict(stk)
        for ck, _n, ents in plan:
            for i, d, eck, j, oc in ents:
                out[eck] = out[eck].at[j, :d, :d, oc].set(Y[ck][i, :d, :d])
        return out

    def _unstack_env(self, pkplan, stk, V, charges, dual: bool = False):
        """Stacked per-bond env -> the per-channel 2-leg dicts the rest of
        the stack consumes (pure slicing; DCE'd when the dicts are dead)."""
        per_a: Dict[int, Dict] = {}
        for a, bk, ck, i, (d0, d1), oa in pkplan:
            per_a.setdefault(a, {})[bk] = stk[ck][i, :d0, :d1, oa]
        out = {}
        for a, qa in enumerate(charges):
            ch = self.group.dual(qa) if dual else qa
            out[a] = SymTensor(self.group, (V, V), (IN, OUT),
                               per_a.get(a, {}), ch, self.dtype)
        return out

    # ------------------------------------------------------------------
    def _A_from_stacks(self, meta, alay, astacks_x) -> SymTensor:
        spaces, arrows = meta
        blocks = {}
        for k in alay.keys:
            ck, i = alay.pos[k]
            d0, d1, d2 = alay.dims[k]
            blocks[k] = astacks_x[ck][i, :d0, :d1, :d2]
        return SymTensor(self.group, spaces, arrows, blocks, None,
                         self.dtype)

    def _build_jits(self):
        T, g, dtype = self.T, self.group, self.dtype
        from ..solvers.krylov import _gmres_restart_core
        from .environments import (_jit_fill_left, _jit_fill_right,
                                   _presweep_left, _presweep_right,
                                   _zero_env_left, _zero_env_right)

        Ws = tuple(self.H.Ws)  # W blocks close over as in-jit constants

        def rebuild_ALs(astacks):
            return tuple(self._A_from_stacks(self._al_meta[x],
                                             self.regL.als[x], astacks[x])
                         for x in range(T))

        def rebuild_ARs(astacks):
            return tuple(self._A_from_stacks(self._ar_meta[x],
                                             self.regR.ars[x], astacks[x])
                         for x in range(T))

        def tmpls_left():
            # in-trace zero templates: XLA folds the template adds
            return [_zero_env_left(g, self.VL[x], self.charges[x], dtype)
                    for x in range(T)]

        def tmpls_right():
            return [_zero_env_right(g, self.VR[x],
                                    self.charges[(x + 1) % T], dtype)
                    for x in range(T)]

        # ---- left ----
        def sweep_left(astacks, rhoT_vec):
            ALs = rebuild_ALs(astacks)
            tmplL = tmpls_left()
            I0 = bond_identity(g, self.VL[0], dtype=dtype)
            cur, CF = _presweep_left(tmplL[0], Ws, ALs, I0,
                                     n_sweeps=self.n_sweeps, fin=self.fin)
            i0x = self.regL.layout.pack(I0)
            cf = self.regL.layout.pack(CF)
            tr = jnp.sum(i0x * rhoT_vec)
            e = jnp.sum(cf * rhoT_vec) / tr
            rhs = cf - e * i0x
            return cur, rhs, e, tr, i0x

        def regL_mv(v, astacks, rhoT_vec, i0x, tr):
            return self.regL.matvec(v, astacks, rhoT_vec, i0x, tr)

        def gmresL(x0, rhs, astacks, rhoT_vec, tr, atol):
            I0 = bond_identity(g, self.VL[0], dtype=dtype)
            i0x = self.regL.layout.pack(I0)
            x, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, astacks, rhoT_vec, i0x, tr), x0, rhs,
                30, atol=atol)
            return x, resid

        def finalize_left(cur, y, astacks):
            ALs = rebuild_ALs(astacks)
            tmplL = tmpls_left()
            GL0 = dict(cur)
            GL0[0] = bond_identity(g, self.VL[0], dtype=dtype)
            GL0[self.fin] = self.regL.layout.unpack(y, tmplL[0][self.fin])
            GLs = _jit_fill_left(GL0, Ws, ALs, tmplL)
            stacks = [_pack_env_stacks(self.lay_gl[x], self._pkplan_gl[x],
                                       GLs[x]) for x in range(T)]
            return list(GLs), stacks

        def refresh_left(astacks, rhoT_vec, x0, tol_s):
            """Whole left refresh (presweep + ONE early-exiting <=30-step
            GMRES restart + fills + passthrough stacking) as a single
            program; the host retries extra warm-started restarts only
            when needed."""
            cur, rhs, e, tr, i0x = sweep_left(astacks, rhoT_vec)
            y, resid, _ = _gmres_restart_core(
                lambda v: regL_mv(v, astacks, rhoT_vec, i0x, tr), x0, rhs,
                30, atol=tol_s * jnp.linalg.norm(rhs))
            GLs, stacks = finalize_left(cur, y, astacks)
            return GLs, stacks, e, y, resid, rhs, cur, tr

        # ---- right ----
        def sweep_right(astacks, sigT_vec):
            ARs = rebuild_ARs(astacks)
            tmplR = tmpls_right()
            I0 = bond_identity(g, self.VR[T - 1], dtype=dtype)
            cur, CI = _presweep_right(tmplR[T - 1], Ws, ARs, I0,
                                      n_sweeps=self.n_sweeps)
            i0x = self.regR.layout.pack(I0)
            ci = self.regR.layout.pack(CI)
            tr = jnp.sum(sigT_vec * i0x)
            e = jnp.sum(sigT_vec * ci) / tr
            rhs = ci - e * i0x
            return cur, rhs, e, tr, i0x

        def regR_mv(v, astacks, sigT_vec, i0x, tr):
            return self.regR.matvec(v, astacks, sigT_vec, i0x, tr)

        def gmresR(x0, rhs, astacks, sigT_vec, tr, atol):
            I0 = bond_identity(g, self.VR[T - 1], dtype=dtype)
            i0x = self.regR.layout.pack(I0)
            x, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, astacks, sigT_vec, i0x, tr), x0, rhs,
                30, atol=atol)
            return x, resid

        def finalize_right(cur, y, astacks):
            ARs = rebuild_ARs(astacks)
            tmplR = tmpls_right()
            GR0 = dict(cur)
            GR0[0] = self.regR.layout.unpack(y, tmplR[T - 1][0])
            GRs = _jit_fill_right(GR0, Ws, ARs, tmplR)
            stacks = [_pack_env_stacks(self.lay_gr[x], self._pkplan_gr[x],
                                       GRs[x]) for x in range(T)]
            return list(GRs), stacks

        def refresh_right(astacks, sigT_vec, x0, tol_s):
            cur, rhs, e, tr, i0x = sweep_right(astacks, sigT_vec)
            y, resid, _ = _gmres_restart_core(
                lambda v: regR_mv(v, astacks, sigT_vec, i0x, tr), x0, rhs,
                30, atol=tol_s * jnp.linalg.norm(rhs))
            GRs, stacks = finalize_right(cur, y, astacks)
            return GRs, stacks, e, y, resid, rhs, cur, tr

        if self.transfer_mode != "dict":
            # class-batched presweeps/fills (batched_transfer.py): the
            # refresh_* closures above pick these up by late binding.
            # Same semantics as the dict versions: pinned-boundary cell
            # sweeps, boundary-channel inflow extraction, interior fills
            # — but every one-site transfer is a handful of large batched
            # einsums on the engine's stacked layout instead of the
            # per-(channel, block) op soup, and the per-channel dicts are
            # cheap SLICES of the stacks (DCE'd when dead).
            def sweep_left(astacks, rhoT_vec):
                stk = self._pin_zeros(self.lay_gl[0], self._maskL,
                                      self._eyesL)
                for _ in range(self.n_sweeps):
                    for x in range(T):
                        stk = self.tplanL[x].apply(stk, astacks[x])
                    stk = self._pin(stk, self._maskL, self._eyesL)
                fill = stk
                for x in range(T):
                    fill = self.tplanL[x].apply(fill, astacks[x])
                cf = self._gather_xl(self._cfL, fill)
                I0 = bond_identity(g, self.VL[0], dtype=dtype)
                i0x = self.regL.layout.pack(I0)
                tr = jnp.sum(i0x * rhoT_vec)
                e = jnp.sum(cf * rhoT_vec) / tr
                rhs = cf - e * i0x
                return stk, rhs, e, tr, i0x

            def finalize_left(cur, y, astacks):
                stk0 = self._scatter_xl(self._cfL, cur, y,
                                        self.regL.layout)
                stacks = [stk0]
                for x in range(T - 1):
                    stacks.append(self.tplanL[x].apply(stacks[x],
                                                       astacks[x]))
                GLs = [self._unstack_env(self._pkplan_gl[x], stacks[x],
                                         self.VL[x], self.charges[x])
                       for x in range(T)]
                return GLs, stacks

            def sweep_right(astacks, sigT_vec):
                stk = self._pin_zeros(self.lay_gr[T - 1], self._maskR,
                                      self._eyesR)
                for _ in range(self.n_sweeps):
                    for x in reversed(range(T)):
                        stk = self.tplanR[x].apply(stk, astacks[x])
                    stk = self._pin(stk, self._maskR, self._eyesR)
                fill = stk
                for x in reversed(range(T)):
                    fill = self.tplanR[x].apply(fill, astacks[x])
                ci = self._gather_xl(self._cfR, fill)
                I0 = bond_identity(g, self.VR[T - 1], dtype=dtype)
                i0x = self.regR.layout.pack(I0)
                tr = jnp.sum(sigT_vec * i0x)
                e = jnp.sum(sigT_vec * ci) / tr
                rhs = ci - e * i0x
                return stk, rhs, e, tr, i0x

            def finalize_right(cur, y, astacks):
                stk_last = self._scatter_xl(self._cfR, cur, y,
                                            self.regR.layout)
                stacks = [None] * T
                stacks[T - 1] = stk_last
                for x in reversed(range(1, T)):
                    stacks[x - 1] = self.tplanR[x].apply(stacks[x],
                                                         astacks[x])
                GRs = [self._unstack_env(self._pkplan_gr[x], stacks[x],
                                         self.VR[x],
                                         self.charges[(x + 1) % T],
                                         dual=True) for x in range(T)]
                return GRs, stacks

        self._gmresL = jax.jit(gmresL)
        self._finalize_left = jax.jit(finalize_left)
        self._refresh_left = jax.jit(refresh_left)
        self._gmresR = jax.jit(gmresR)
        self._finalize_right = jax.jit(finalize_right)
        self._refresh_right = jax.jit(refresh_right)
        # raw (unjitted) pieces: the fused whole-iteration VUMPS program
        # (algorithms/fused_vumps.py) inlines them into its own trace
        self.raw = {
            "sweep_left": sweep_left, "regL_mv": regL_mv,
            "finalize_left": finalize_left,
            "sweep_right": sweep_right, "regR_mv": regR_mv,
            "finalize_right": finalize_right,
        }

    # ------------------------------------------------------------------
    def left(self, psi, H, tol: float, gl_final0=None):
        """Returns (per-channel dicts, energy/cell, per-bond stacked arrays).

        The stacks share the eigensolver plans' layout (lay_gl[x]); vumps
        feeds them straight into layout-matched PaddedHAC/PaddedHC plans,
        skipping the per-iteration dict -> host -> stacks repack.

        Device contract (utils/device.py): operands are packed on the host
        (eager block ops stay on CPU) and shipped once; the jitted refresh
        runs on the accelerator when one is visible; dict/stack results are
        pulled back to the host for the eager structure layer above."""
        from ..utils.device import to_accel, to_host
        from .environments import rho_right
        T = self.T
        astacks = self.regL.pack_As(psi)
        rhoT_vec = self.regL.layout.pack_transposed(rho_right(psi.Cs[T - 1]))
        x0 = (self.regL.layout.pack(gl_final0)
              if gl_final0 is not None
              and gl_final0.spaces == (self.VL[0], self.VL[0])
              else jnp.zeros((self.regL.layout.total,), dtype=self.dtype))
        astacks, rhoT_vec, x0 = to_accel((astacks, rhoT_vec, x0))
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
        return to_host((GLs, e, stacks))

    def right(self, psi, H, tol: float, gr_init0=None):
        from ..utils.device import to_accel, to_host
        from .environments import rho_left
        T = self.T
        astacks = self.regR.pack_As(psi)
        sigT_vec = self.regR.layout.pack_transposed(rho_left(psi.Cs[T - 1]))
        x0 = (self.regR.layout.pack(gr_init0)
              if gr_init0 is not None
              and gr_init0.spaces == (self.VR[T - 1], self.VR[T - 1])
              else jnp.zeros((self.regR.layout.total,), dtype=self.dtype))
        astacks, sigT_vec, x0 = to_accel((astacks, sigT_vec, x0))
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
        return to_host((GRs, e, stacks))
