"""Bucketed Newton-Schulz polar gauge update.

The VUMPS gauge step AL = Q(AC) Q(C)^dag (algorithms/vumps.gauge_from_AC_C)
needs only the ISOMETRY factors of AC and C.  On TPU, per-block Householder
QR lowers to sequential custom calls that dominate the iteration (~20 ms of
a 44 ms chi~2752 iteration, bench.py round 2), while the polar factor can be
computed with matmuls alone: the Newton-Schulz iteration

    U <- 1.5 U - 0.5 U (U^dag U),   U_0 = X / s_max-bound

converges to the orthogonal polar factor for every singular direction
(s -> 1.5 s - 0.5 s^3).  The original VUMPS formulation (PRB 97, 045145)
uses exactly these polar gauges; MPSKit's QRpos is an equivalent choice.

TPU-native structure: the per-sector matrices of ALL FOUR factorizations
(AC 2-row, AC 1-row-transposed, C left/right) are bucketed JOINTLY into
pow2 shape classes, so one gauge update runs a handful of batched-einsum
NS chains on the MXU instead of thousands of tiny sequential
factorizations.  Scaling uses Higham's bound ||X||_2 <= sqrt(||X||_1
||X||_inf) (tighter than Frobenius by ~sqrt(rank), saving ~5 iterations).
Zero padding is exact: pad rows/cols stay identically zero.  Wide blocks
(rows < cols for a left factor, transients only) fall back to per-block QR.
"""

from __future__ import annotations

import warnings
from collections import defaultdict
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..mps.imps import absorb_bond_left, absorb_bond_right
from ..symmetry.spaces import Space
from ..tensor.linalg import (_left_factor, _pos_diag, _right_factor,
                             matricize)
from ..tensor.symtensor import SymTensor, tensordot


def _bucket(d: int) -> int:
    b = 8
    while b < d:
        b *= 2
    return b


# Quintic odd-polynomial step x -> ax + bx^3 + cx^5 with the minimax-style
# coefficients popularized by accelerated Newton-Schulz orthogonalizers:
# slope 3.44 at 0 lifts tiny singular values ~2.3x faster per step than the
# cubic NS slope 1.5, while |f(x)| stays <= 1.21 on [0, 1] — inside the NS
# convergence basin (0, sqrt(3)) — so a short plain-NS tail polishes the
# spectrum to the fixed point quadratically.  The scalar map of the
# (10, 6) schedule DOMINATES 26 plain NS steps pointwise on [1e-8, 1] and
# converges directions down to s ~ 1e-6 (26xNS only reaches ~1e-4) at 42
# matmuls vs 52.
_QUINTIC = (3.4445, -4.7750, 2.0315)


def _minimax_quintic(
        l: float, u: float) -> Tuple[np.ndarray, float, float, float]:
    """Minimax approximation of the constant 1 on [l, u] by an odd quintic
    a x + b x^3 + c x^5: classic Remez exchange over (a, b, c, E) with
    equioscillation at 4 reference points.  Returns (coeffs, max_error,
    image_lo, image_hi) where [image_lo, image_hi] brackets the sampled
    image of [l, u] under the quintic (with small inflation for grid
    resolution)."""
    xs = np.unique(np.concatenate([
        np.linspace(l, u, 4000),
        np.geomspace(max(l, 1e-14), u, 4000),
        # dense patch near the lower edge: the composed map's slope there
        # is huge (~1/l), so inter-point excursions hide from coarse grids
        np.geomspace(max(l, 1e-14), min(u, 1e3 * max(l, 1e-14)), 4000)]))
    Phi = np.stack([xs, xs ** 3, xs ** 5], 1)
    t = np.cos(np.pi * np.arange(4) / 3.0)
    ref = np.sort(l + (u - l) * (t + 1.0) / 2.0)
    coef = np.array([1.0 / u, 0.0, 0.0])
    E = np.inf
    for _ in range(80):
        A = np.zeros((4, 4))
        A[:, 0], A[:, 1], A[:, 2] = ref, ref ** 3, ref ** 5
        A[:, 3] = [(-1.0) ** i for i in range(4)]
        try:
            sol = np.linalg.solve(A, np.ones(4))
        except np.linalg.LinAlgError:
            break
        coef, E = sol[:3], abs(sol[3])
        err = Phi @ coef - 1.0
        ae = np.abs(err)
        # alternating-sign local extrema (one representative per sign run)
        cand = [0] + [i for i in range(1, len(xs) - 1)
                      if ae[i] >= ae[i - 1] and ae[i] >= ae[i + 1]] \
            + [len(xs) - 1]
        groups: list = []
        for i in cand:
            s = np.sign(err[i])
            if groups and np.sign(err[groups[-1]]) == s:
                if ae[i] > ae[groups[-1]]:
                    groups[-1] = i
            else:
                groups.append(i)
        if len(groups) < 4:
            break
        # window of 4 consecutive alternating extrema with the largest
        # smallest amplitude (must contain the global max by optimality)
        best = max(range(len(groups) - 3),
                   key=lambda j: min(ae[g] for g in groups[j:j + 4]))
        new_ref = np.sort(xs[groups[best:best + 4]])
        if np.max(ae) <= E * (1.0 + 1e-9):
            ref = new_ref
            break
        ref = new_ref
    # MEASURED image of [l, u] under f governs the next interval (the
    # levelled E underestimates the sup when the exchange has not fully
    # converged); small inflation covers grid resolution.  This is a
    # sampled bracket, not a proof — the final composed-map check in
    # _express_coeffs (dense grid + 1e-8 acceptance) is the real gate,
    # and any failure falls back to the fixed (10, 6) schedule.
    fx = Phi @ coef
    eps = float(np.max(np.abs(fx - 1.0)))
    lo = float(np.min(fx)) * (1.0 - 1e-6)
    hi = float(np.max(fx)) * (1.0 + 1e-6)
    return coef, eps, lo, hi


def _express_coeffs(l0: float = 1e-7, tol: float = 3e-7,
                    max_steps: int = 20,
                    verify_tol: float = 1e-8) -> Tuple[Tuple[float, ...], ...]:
    """Greedy per-step minimax quintic schedule ("polar express" style,
    arXiv:2505.16932's construction recomputed numerically): step k applies
    the odd quintic minimizing max |f(x) - 1| over the current singular-
    value bracket [l_k, u_k]; the next bracket is the measured image of the
    map.  The schedule is verified against the composed scalar map on a
    dense grid at `verify_tol` — the accuracy downstream users (tests,
    CLAUDE.md) actually rely on; the per-step `tol` only controls when the
    greedy construction stops adding steps, and the last Remez step
    overshoots it by orders of magnitude.  On any verification failure the
    caller falls back to the fixed (10, 6) schedule (with a warning).
    Returns a tuple of (a, b, c) triples."""
    # safety headroom above the Higham bound for f32 rounding
    l, u = float(l0), 1.01
    steps = []
    for _ in range(max_steps):
        coef, eps, lo, hi = _minimax_quintic(l, u)
        if not np.all(np.isfinite(coef)) or lo <= 0.0 or hi > 3.0:
            return ()
        steps.append(tuple(float(v) for v in coef))
        if eps <= tol:
            break
        l, u = lo, hi
    else:
        return ()
    # verify: composed map sends [l0, 1.01] into 1 +- verify_tol, sampled
    # densely (extra resolution near l0 where the composed slope ~1/l0)
    xs = np.unique(np.concatenate([
        np.geomspace(l0, 1.01, 40001),
        np.geomspace(l0, min(1.01, 1e3 * l0), 40001)]))
    ys = xs.copy()
    for a, b, c in steps:
        ys = a * ys + b * ys ** 3 + c * ys ** 5
        if not np.all(np.isfinite(ys)) or np.min(ys) <= 0.0 \
                or np.max(ys) > 3.0:
            return ()
    if np.max(np.abs(ys - 1.0)) > verify_tol:
        return ()
    return tuple(steps)


_EXPRESS_CACHE: Dict = {}
_EXPRESS_WARNED: set = set()


def _norm_schedule(iters):
    """Normalized, hashable schedule: ("express", ((a,b,c), ...)) for the
    greedy minimax schedule, else (quintic_steps, ns_steps); a bare int
    means legacy pure-NS."""
    if iters == "express" or (isinstance(iters, tuple) and iters
                              and iters[0] == "express"):
        if (isinstance(iters, tuple) and len(iters) == 2
                and isinstance(iters[1], tuple) and iters[1]
                and isinstance(iters[1][0], tuple)):
            return iters   # already-normalized ("express", coeff-triples)
        args = tuple(iters[1:]) if isinstance(iters, tuple) else ()
        hit = _EXPRESS_CACHE.get(args)
        if hit is None:
            hit = _express_coeffs(*args)
            _EXPRESS_CACHE[args] = hit
        if hit:
            return ("express", hit)
        # construction failed: fixed schedule — loudly, once, because the
        # scalar-map accuracy drops from ~1e-9 to ~1e-3 on this path
        if args not in _EXPRESS_WARNED:
            _EXPRESS_WARNED.add(args)
            warnings.warn(
                "minimax-quintic polar schedule construction failed "
                f"(args={args}); falling back to the fixed (10, 6) "
                "schedule with ~1e-3 scalar-map error",
                RuntimeWarning, stacklevel=2)
        return (10, 6)
    return (0, int(iters)) if isinstance(iters, int) else tuple(iters)


def _ns_polar_stack(X: jnp.ndarray, iters="express") -> jnp.ndarray:
    """Polar factor of a (n, R, C) stack with R >= C: per-step minimax
    quintics (default), or quintic accelerated Newton-Schulz steps followed
    by plain cubic NS polish steps."""
    sched = _norm_schedule(iters)
    # Higham scaling: ||X||_2 <= sqrt(||X||_1 ||X||_inf), per stack entry
    a1 = jnp.max(jnp.sum(jnp.abs(X), axis=1), axis=-1)   # max col sum
    ai = jnp.max(jnp.sum(jnp.abs(X), axis=2), axis=-1)   # max row sum
    s = jnp.sqrt(jnp.maximum(a1 * ai, 1e-60))
    U = X / s[:, None, None]

    def quintic_step(U, a, b, c):
        G = jnp.einsum("bij,bik->bjk", jnp.conj(U), U)
        V = b * G + c * jnp.einsum("bij,bjk->bik", G, G)
        return a * U + jnp.einsum("bij,bjk->bik", U, V)

    if sched[0] == "express":
        coefs = jnp.asarray(sched[1], dtype=jnp.real(jnp.zeros((),
                                                               X.dtype)).dtype)

        def body(i, U):
            return quintic_step(U, coefs[i, 0], coefs[i, 1], coefs[i, 2])

        return lax.fori_loop(0, len(sched[1]), body, U)

    nq, nn = sched
    a, b, c = _QUINTIC

    def quintic(_, U):
        return quintic_step(U, a, b, c)

    def ns(_, U):
        G = jnp.einsum("bij,bik->bjk", jnp.conj(U), U)
        return 1.5 * U - 0.5 * jnp.einsum("bij,bjk->bik", U, G)

    U = lax.fori_loop(0, nq, quintic, U)
    return lax.fori_loop(0, nn, ns, U)


def full_like_zero(t: SymTensor) -> SymTensor:
    """Template with the complete allowed-block table (host, cheap)."""
    z = type(t).zeros(t.group, t.spaces, t.arrows, t.charge, t.dtype)
    return z + t


class _SideMeta:
    """Static metadata for one matricization side."""

    __slots__ = ("nrows", "right", "sectors", "shapes", "fallback")

    def __init__(self, template: SymTensor, nrows: int, right: bool):
        self.nrows = nrows
        self.right = right
        with jax.default_device(jax.devices("cpu")[0]):
            mats, _ri, _ci = matricize(full_like_zero(template), nrows)
        self.sectors = sorted(mats.keys())
        self.shapes = {r: tuple(mats[r].shape) for r in self.sectors}
        self.fallback = []
        for r in self.sectors:
            R, C = self.shapes[r]
            a, b = (C, R) if right else (R, C)
            if a < b:
                self.fallback.append(r)

    def tall_shape(self, r):
        R, C = self.shapes[r]
        return (C, R) if self.right else (R, C)

    def _sig(self):
        return (self.nrows, self.right, tuple(self.sectors),
                tuple(sorted(self.shapes.items())))


class PolarGaugePlan:
    """Per-site bucketed polar gauge: (AC, C_left, C_right) -> (AL, AR,
    gauge errors).  Hashable on the static block structures so the whole
    update jits as one program; the NS chains of all four factorizations
    share bucket classes."""

    SIDES = ("ac2", "cr", "ac1", "cl")

    def __init__(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor,
                 iters="express"):
        self.iters = _norm_schedule(iters)
        self.meta = {
            "ac2": _SideMeta(AC, 2, right=False),
            "cr": _SideMeta(Cr, 1, right=False),
            "ac1": _SideMeta(AC, 1, right=True),
            "cl": _SideMeta(Cl, 1, right=True),
        }
        # joint bucket classes over (side, sector) in tall orientation
        self.classes: Dict[Tuple[int, int], list] = defaultdict(list)
        self.pos: Dict = {}
        for side in self.SIDES:
            m = self.meta[side]
            for r in m.sectors:
                if r in m.fallback:
                    continue
                a, b = m.tall_shape(r)
                ck = (_bucket(a), _bucket(b))
                self.pos[(side, r)] = (ck, len(self.classes[ck]))
                self.classes[ck].append((side, r))
        self.class_keys = sorted(self.classes.keys())
        # global per-sector index tables for the class-batched assembly:
        # the C-matrix sides (cr / cl) scatter into one sector-indexed
        # stack; the AC sides gather their bond sector's partner from it
        # (apply() does the AL/AR products and gauge errors entirely in
        # the class-stack domain — per-sector GEMM/absorb/norm soup was
        # the measured majority of the gauge stage at chi ~ 2752)
        self.gpad = max([max(ck) for ck in self.class_keys
                         if any(s in ("cr", "cl")
                                for s, _r in self.classes[ck])] or [1])
        self.gsec = {}
        for side in ("cr", "cl"):
            m = self.meta[side]
            self.gsec[side] = {r: i for i, r in enumerate(
                r_ for r_ in m.sectors if r_ not in m.fallback)}
        # every AC bond sector must have a C-side partner: in the batched
        # assembly a missing sector would gather the all-zero pad slot and
        # silently produce zero AL/AR blocks with a masked-out gauge error
        # (where the dict path would KeyError) — fail loudly at build
        for ac_side, c_side in (("ac2", "cr"), ("ac1", "cl")):
            missing = [r for r in self.meta[ac_side].sectors
                       if r not in self.meta[c_side].sectors]
            if missing:
                raise ValueError(
                    f"PolarGaugePlan: AC {ac_side} bond sectors {missing} "
                    f"have no {c_side} C-matrix block (inconsistent AC/C "
                    "structures)")
        self._sig = (tuple((s, self.meta[s]._sig()) for s in self.SIDES),
                     self.iters)

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return (isinstance(other, PolarGaugePlan)
                and self._sig == other._sig)

    # -- core -------------------------------------------------------------
    def _factors(self, tensors: Dict[str, SymTensor]):
        """All four isometry factors via joint batched NS."""
        mats = {}
        infos = {}
        for side in self.SIDES:
            m = self.meta[side]
            mm, ri, ci = matricize(tensors[side], m.nrows)
            mats[side] = mm
            infos[side] = (ri, ci)

        def mat_of(side, r):
            m = mats[side].get(r)
            if m is None:
                m = jnp.zeros(self.meta[side].shapes[r],
                              dtype=tensors[side].dtype)
            return m

        dtype = tensors["ac2"].dtype
        Qs: Dict[str, Dict] = {side: {} for side in self.SIDES}
        for ck in self.class_keys:
            entries = self.classes[ck]
            X = jnp.zeros((len(entries),) + ck, dtype=dtype)
            for i, (side, r) in enumerate(entries):
                m = mat_of(side, r)
                if self.meta[side].right:
                    m = jnp.swapaxes(jnp.conj(m), 0, 1)
                X = X.at[i, :m.shape[0], :m.shape[1]].set(m)
            U = _ns_polar_stack(X, self.iters)
            for i, (side, r) in enumerate(entries):
                R, C = self.meta[side].shapes[r]
                if self.meta[side].right:
                    Qs[side][r] = jnp.swapaxes(jnp.conj(U[i, :C, :R]), 0, 1)
                else:
                    Qs[side][r] = U[i, :R, :C]
        # wide transients: per-block QR
        for side in self.SIDES:
            m = self.meta[side]
            for r in m.fallback:
                blk = mat_of(side, r)
                if m.right:
                    qt, rt = jnp.linalg.qr(jnp.conj(blk.T), mode="reduced")
                    qt, _ = _pos_diag(qt, rt)
                    Qs[side][r] = jnp.conj(qt.T)
                else:
                    q, rr = jnp.linalg.qr(blk, mode="reduced")
                    q, _ = _pos_diag(q, rr)
                    Qs[side][r] = q

        out = {}
        for side in self.SIDES:
            m = self.meta[side]
            ri, ci = infos[side]
            T = tensors[side]
            bond = Space(T.group, {r: (Qs[side][r].shape[0] if m.right
                                       else Qs[side][r].shape[1])
                                   for r in Qs[side]})
            if m.right:
                out[side] = _right_factor(T, m.nrows, ci, Qs[side], bond)
            else:
                out[side] = _left_factor(T, m.nrows, ri, Qs[side], bond)
        return out

    def apply(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor):
        import os
        if (any(self.meta[s].fallback for s in self.SIDES)
                or os.environ.get("HTN_GAUGE_ASSEMBLY", "") == "dict"):
            return self._apply_dict(AC, Cl, Cr)
        return self._apply_batched(AC, Cl, Cr)

    def _apply_dict(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor):
        """Per-sector assembly path (wide transients only): factor dicts,
        per-sector products, full-tensor error norms."""
        F = self._factors({"ac2": AC, "cr": Cr, "ac1": AC, "cl": Cl})
        AL = tensordot(F["ac2"], F["cr"].conj(), axes=([2], [1]))
        AR = tensordot(F["cl"].conj(), F["ac1"], axes=([0], [0]))
        dl = (AC - absorb_bond_right(AL, Cr)).norm()
        dr = (AC - absorb_bond_left(Cl, AR)).norm()
        return AL, AR, dl, dr

    def _apply_batched(self, AC: SymTensor, Cl: SymTensor, Cr: SymTensor):
        """Class-batched assembly: the AL/AR products and the gauge
        errors are computed inside the bucket stacks (one einsum per
        class) instead of per sector.  Mathematically identical to
        ``_apply_dict`` — the per-sector relations are
        AL_q = U_ac2_q U_cr_q^dag, AR_q = U_cl_q conj(U_ac1_q)^T,
        dl^2 = sum_q ||X_ac2_q - AL_q X_cr_q||^2, and (in the stored
        tall conj-transposed orientation of the right sides)
        dr^2 = sum_q ||X_ac1_q - conj(AR_q)^T X_cl_q||^2 — the measured
        gauge stage at chi ~ 2752 was dominated by the per-sector
        GEMM/absorb/norm op soup, not by the NS chains."""
        tensors = {"ac2": AC, "cr": Cr, "ac1": AC, "cl": Cl}
        dtype = AC.dtype
        rdt = jnp.real(jnp.zeros((), dtype)).dtype
        mats, infos = {}, {}
        for side in self.SIDES:
            mm, ri, ci = matricize(tensors[side], self.meta[side].nrows)
            mats[side] = mm
            infos[side] = (ri, ci)

        # tall class stacks of the matricizations + their polar factors
        X: Dict = {}
        for ck in self.class_keys:
            entries = self.classes[ck]
            Xc = jnp.zeros((len(entries),) + ck, dtype=dtype)
            for i, (side, r) in enumerate(entries):
                m = mats[side].get(r)
                if m is None:
                    continue
                if self.meta[side].right:
                    m = jnp.swapaxes(jnp.conj(m), 0, 1)
                Xc = Xc.at[i, :m.shape[0], :m.shape[1]].set(m)
            X[ck] = Xc
        U = {ck: _ns_polar_stack(X[ck], self.iters) for ck in self.class_keys}

        # global sector-indexed stacks of the C sides (raw + polar);
        # the extra last slot stays zero and absorbs non-AC gathers
        P = self.gpad
        G: Dict = {}
        for side in ("cr", "cl"):
            nq = len(self.gsec[side])
            GX = jnp.zeros((nq + 1, P, P), dtype=dtype)
            GU = jnp.zeros((nq + 1, P, P), dtype=dtype)
            for ck in self.class_keys:
                slots = np.array([i for i, (s, _r) in
                                  enumerate(self.classes[ck]) if s == side])
                if slots.size == 0:
                    continue
                gidx = np.array([self.gsec[side][self.classes[ck][i][1]]
                                 for i in slots])
                pad = ((0, 0), (0, P - ck[0]), (0, P - ck[1]))
                GX = GX.at[gidx].set(jnp.pad(X[ck][slots], pad))
                GU = GU.at[gidx].set(jnp.pad(U[ck][slots], pad))
            G[side] = (GX, GU)

        AL_stacks: Dict = {}
        AR_stacks: Dict = {}
        dl2 = jnp.zeros((), rdt)
        dr2 = jnp.zeros((), rdt)
        for ck in self.class_keys:
            entries = self.classes[ck]
            _R, C = ck
            zero_cr = len(self.gsec["cr"])
            zero_cl = len(self.gsec["cl"])
            idx_cr = np.array([self.gsec["cr"].get(r, zero_cr)
                               if s == "ac2" else zero_cr
                               for (s, r) in entries])
            idx_cl = np.array([self.gsec["cl"].get(r, zero_cl)
                               if s == "ac1" else zero_cl
                               for (s, r) in entries])
            if np.any(idx_cr != zero_cr):
                GXcr, GUcr = G["cr"]
                Ucr = GUcr[idx_cr][:, :C, :C]
                Xcr = GXcr[idx_cr][:, :C, :C]
                ALc = jnp.einsum("nrb,ncb->nrc", U[ck], jnp.conj(Ucr))
                Y = jnp.einsum("nrc,ncd->nrd", ALc, Xcr)
                mask = jnp.asarray((idx_cr != zero_cr).astype(np.float32),
                                   rdt)
                dl2 = dl2 + jnp.sum(
                    jnp.abs(X[ck] - Y) ** 2 * mask[:, None, None])
                AL_stacks[ck] = ALc
            if np.any(idx_cl != zero_cl):
                GXcl, GUcl = G["cl"]
                Ucl = GUcl[idx_cl][:, :C, :C]
                Xcl = GXcl[idx_cl][:, :C, :C]
                ARc = jnp.einsum("ncb,nrb->ncr", Ucl, jnp.conj(U[ck]))
                Z = jnp.einsum("ncr,ncd->nrd", jnp.conj(ARc), Xcl)
                mask = jnp.asarray((idx_cl != zero_cl).astype(np.float32),
                                   rdt)
                dr2 = dr2 + jnp.sum(
                    jnp.abs(X[ck] - Z) ** 2 * mask[:, None, None])
                AR_stacks[ck] = ARc

        # dematricize AL / AR straight out of the class stacks
        ri2 = infos["ac2"][0]
        ci1 = infos["ac1"][1]
        al_blocks: Dict = {}
        ar_blocks: Dict = {}
        for r in self.meta["ac2"].sectors:
            ck, slot = self.pos[("ac2", r)]
            chi = self.meta["ac2"].shapes[r][1]
            for rkey, roff, rshape in ri2.entries.get(r, ()):
                rsize = int(np.prod(rshape)) if rshape else 1
                al_blocks[rkey + (r,)] = AL_stacks[ck][
                    slot, roff:roff + rsize, :chi].reshape(rshape + (chi,))
        for r in self.meta["ac1"].sectors:
            ck, slot = self.pos[("ac1", r)]
            chi = self.meta["ac1"].shapes[r][0]
            for ckey, coff, cshape in ci1.entries.get(r, ()):
                csize = int(np.prod(cshape)) if cshape else 1
                ar_blocks[(r,) + ckey] = AR_stacks[ck][
                    slot, :chi, coff:coff + csize].reshape((chi,) + cshape)
        AL = SymTensor(AC.group, (AC.spaces[0], AC.spaces[1], Cr.spaces[0]),
                       AC.arrows, al_blocks, AC.charge, dtype)
        AR = SymTensor(AC.group, (Cl.spaces[1], AC.spaces[1], AC.spaces[2]),
                       AC.arrows, ar_blocks, AC.charge, dtype)
        return AL, AR, jnp.sqrt(dl2), jnp.sqrt(dr2)


@partial(jax.jit, static_argnames=("plan",))
def gauge_site_polar(AC: SymTensor, Cl: SymTensor, Cr: SymTensor, *,
                     plan: PolarGaugePlan):
    """Jitted bucketed polar gauge update for one site."""
    return plan.apply(AC, Cl, Cr)
