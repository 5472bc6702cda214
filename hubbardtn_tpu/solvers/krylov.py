"""Matrix-free Krylov solvers over packed symmetric tensors.

TPU-native equivalent of the KrylovKit solvers the reference drives through
MPSKit (Lanczos/Arnoldi eigsolve, GMRES linsolve; reference call site for the
excitation solver: /root/reference/src/HubbardFunctions.jl:1176).

Krylov vectors are *packed*: a :class:`Packer` flattens all blocks of a
:class:`SymTensor` (fixed block table) into one contiguous 1-D array, so the
recurrence is a handful of BLAS-1 ops per iteration instead of thousands of
per-block dispatches, and the jitted matvec unpacks/applies/packs inside a
single XLA program.  The Packer is hashable, so it can ride as a static
argument of jitted matvecs and the trace cache stays warm across iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor.symtensor import SymTensor


def full_blocks(t: SymTensor) -> SymTensor:
    """Canonicalize to the complete allowed-block table (missing blocks = 0)."""
    z = type(t).zeros(t.group, t.spaces, t.arrows, t.charge, t.dtype)
    return z + t


class Packer:
    """Bijection between SymTensors of a fixed structure and flat 1-D arrays.

    Hashable on the static structure so jitted functions can close over it
    via ``static_argnames``."""

    __slots__ = ("cls", "group", "spaces", "arrows", "charge", "dtype", "keys",
                 "shapes", "sizes", "offsets", "total")

    def __init__(self, template: SymTensor):
        self.cls = type(template)
        self.group = template.group
        self.spaces = template.spaces
        self.arrows = template.arrows
        self.charge = template.charge
        self.dtype = template.dtype
        self.keys = tuple(sorted(template.allowed_keys()))
        self.shapes = tuple(template.key_shape(k) for k in self.keys)
        self.sizes = tuple(int(np.prod(s)) if s else 1 for s in self.shapes)
        offs, off = [], 0
        for s in self.sizes:
            offs.append(off)
            off += s
        self.offsets = tuple(offs)
        self.total = off

    def _sig(self):
        return (self.cls, id(self.group), self.spaces, self.arrows,
                self.charge, str(self.dtype), self.keys)

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, Packer) and self._sig() == other._sig()

    def pack(self, t: SymTensor) -> jnp.ndarray:
        parts = []
        for k, shape, size in zip(self.keys, self.shapes, self.sizes):
            b = t.blocks.get(k)
            if b is None:
                parts.append(jnp.zeros((size,), dtype=self.dtype))
            else:
                parts.append(b.reshape(size).astype(self.dtype))
        if not parts:
            return jnp.zeros((0,), dtype=self.dtype)
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            # eager path through numpy: XLA CPU's eager concatenate is in
            # the same custom-call family as the eager-pad heap corruptor
            # (see tensor/linalg.pad_leg); keep it off the hot loop
            buf = np.concatenate([np.asarray(p) for p in parts])
            return jnp.asarray(buf)
        return jnp.concatenate(parts)

    def unpack(self, vec: jnp.ndarray) -> SymTensor:
        blocks: Dict = {}
        for k, shape, size, off in zip(self.keys, self.shapes, self.sizes,
                                       self.offsets):
            blocks[k] = vec[off:off + size].reshape(shape)
        return self.cls(self.group, self.spaces, self.arrows, blocks,
                        self.charge, self.dtype)

    def random(self, seed: int = 0) -> jnp.ndarray:
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.total)
        if jnp.dtype(self.dtype).kind == "c":
            v = v + 1j * rng.standard_normal(self.total)
        return jnp.asarray(v, dtype=self.dtype)


class TreePacker:
    """Bijection between an arbitrary pytree of arrays (fixed structure) and
    one flat 1-D vector.  Hashable on the static structure (treedef + leaf
    shapes + dtype), so jitted matvecs can take it via ``static_argnames``."""

    __slots__ = ("treedef", "shapes", "sizes", "offsets", "total", "dtype")

    def __init__(self, template, dtype=None):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        self.treedef = treedef
        self.shapes = tuple(tuple(l.shape) for l in leaves)
        self.sizes = tuple(int(np.prod(s)) if s else 1 for s in self.shapes)
        offs, off = [], 0
        for s in self.sizes:
            offs.append(off)
            off += s
        self.offsets = tuple(offs)
        self.total = off
        self.dtype = jnp.dtype(dtype) if dtype is not None else (
            jnp.result_type(*leaves) if leaves else jnp.dtype(jnp.float64))

    def _sig(self):
        return (self.treedef, self.shapes, str(self.dtype))

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return isinstance(other, TreePacker) and self._sig() == other._sig()

    def pack(self, tree) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(tree)
        if not leaves:
            return jnp.zeros((0,), dtype=self.dtype)
        parts = [l.reshape(-1).astype(self.dtype) for l in leaves]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            return jnp.asarray(np.concatenate([np.asarray(p) for p in parts]))
        return jnp.concatenate(parts)

    def unpack(self, vec: jnp.ndarray):
        leaves = [vec[o:o + s].reshape(shape)
                  for o, s, shape in zip(self.offsets, self.sizes, self.shapes)]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


# ----------------------------------------------------------------------
# Fully-jitted Krylov restarts: one XLA program (one device dispatch) per
# restart instead of one per matvec.  On the remote-TPU tunnel every
# dispatch is an RPC round trip, so this is the difference between ~k
# round trips and 1 per restart; on-chip it removes the dispatch tail the
# host-driven loop leaves at large chi (SURVEY.md section 2B, Krylov row).
# ----------------------------------------------------------------------

from jax import lax


def _lanczos_restart_core(mv, v, k: int, atol=None):
    """One Lanczos restart of up to k steps with full reorthogonalization,
    entirely on device: while_loop recurrence that EXITS EARLY once the
    off-diagonal beta drops below ``atol`` (the Krylov space is then
    invariant to atol, so the Ritz residual |beta_j c_j| <= beta_j <= atol
    is converged), masked tridiagonal eigensolve (rows never reached get a
    +1e30 penalty so they never win), Ritz refinement.  With warm starts
    near convergence this costs 1-2 matvecs instead of k.
    Returns (theta, v_new, resid)."""
    n = v.shape[0]
    v = v / jnp.linalg.norm(v)
    V = jnp.zeros((k + 1, n), v.dtype).at[0].set(v)
    rdt = jnp.real(jnp.zeros((), v.dtype)).dtype
    alphas = jnp.zeros((k,), rdt)
    betas = jnp.zeros((k,), rdt)
    atol_ = jnp.asarray(0.0 if atol is None else atol, rdt)

    def cond(carry):
        j, V, alphas, betas = carry
        # rows beyond a sub-atol beta never improve the Ritz pair
        return (j < k) & ((j == 0) | (betas[jnp.maximum(j - 1, 0)] > atol_))

    def body(carry):
        j, V, alphas, betas = carry
        w = mv(V[j])
        a = jnp.real(jnp.vdot(V[j], w))
        # unwritten rows of V are zero, so full-matrix reorthogonalization
        # is exact under the dynamic step count
        c1 = jnp.conj(V) @ w
        w = w - V.T @ c1
        c2 = jnp.conj(V) @ w
        w = w - V.T @ c2
        b = jnp.linalg.norm(w)
        V = V.at[j + 1].set(jnp.where(b > 1e-300,
                                      w / jnp.maximum(b, 1e-300), 0.0))
        return j + 1, V, alphas.at[j].set(a), betas.at[j].set(b)

    j_end, V, alphas, betas = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), V, alphas, betas))
    rows = jnp.arange(k)
    valid = (rows < j_end) & jnp.concatenate(
        [jnp.ones((1,), bool), jnp.cumprod(betas[:k - 1] > 1e-14) > 0])
    alphas_m = jnp.where(valid, alphas, jnp.asarray(1e30, rdt))
    betas_m = jnp.where(valid[1:], betas[:k - 1], 0.0)
    Tm = (jnp.diag(alphas_m) + jnp.diag(betas_m, 1) + jnp.diag(betas_m, -1))
    evals, evecs = jnp.linalg.eigh(Tm)
    theta = evals[0]
    c = evecs[:, 0]
    v_new = V[:k].T @ c.astype(V.dtype)
    v_new = v_new / jnp.linalg.norm(v_new)
    last = jnp.maximum(j_end - 1, 0)
    resid = jnp.abs(betas[last] * c[last]) * (jnp.sum(valid) == j_end)
    return theta, v_new, resid, j_end


@partial(jax.jit, static_argnames=("plan", "k"))
def _lanczos_restart_plan(v, ops, *, plan, k: int, atol=None):
    return _lanczos_restart_core(lambda x: plan.matvec(x, *ops), v, k,
                                 atol=atol)


def lanczos_ground_plan(plan, ops: tuple, v0: jnp.ndarray,
                        krylov_dim: int = 16, tol: float = 1e-12,
                        max_restarts: int = 100
                        ) -> Tuple[float, jnp.ndarray, dict]:
    """Smallest eigenpair of the hashable ``plan``'s matvec (signature
    ``plan.matvec(v, *ops)``) with fully-jitted restarts: the host syncs
    once per restart, on the scalar residual; inside a restart the device
    loop exits early once the recurrence closes below ``tol`` (warm starts
    near convergence cost 1-2 matvecs instead of krylov_dim)."""
    v = v0
    theta = np.inf
    resid = np.inf
    iters = 0
    atol = jnp.asarray(tol)
    for _ in range(max_restarts):
        theta, v, resid, j = _lanczos_restart_plan(v, ops, plan=plan,
                                                   k=krylov_dim, atol=atol)
        iters += int(j)
        if float(resid) < tol:
            break
    return float(theta), v, {"resid": float(resid), "iters": iters}


def _gmres_restart_core(mv, x, b, k: int, atol=None):
    """One GMRES restart of up to k steps entirely on device: Arnoldi
    while_loop with full reorthogonalization and Givens-rotation residual
    tracking (|g[j]| IS the current residual norm), exiting early once it
    drops below ``atol``; masked triangular solve for the update.  Warm
    starts near the solution cost a few matvecs instead of k.
    Returns (x_new, abs_resid)."""
    n = b.shape[0]
    dt = b.dtype
    rdt = jnp.real(jnp.zeros((), dt)).dtype
    r = b - mv(x)
    beta = jnp.linalg.norm(r)
    V = jnp.zeros((k + 1, n), dt).at[0].set(
        jnp.where(beta > 1e-300, r / jnp.maximum(beta, 1e-300), 0.0))
    R = jnp.zeros((k + 1, k), dt)          # Givens-rotated Hessenberg
    g = jnp.zeros((k + 1,), dt).at[0].set(beta.astype(dt))
    cs = jnp.zeros((k,), dt)               # rotation j: G = [[cs, sn],
    sn = jnp.zeros((k,), dt)               #   [-conj(sn), conj(cs)]]
    atol_ = jnp.asarray(0.0 if atol is None else atol, rdt)

    def cond(carry):
        j, V, R, g, cs, sn = carry
        return (j < k) & (jnp.abs(g[j]) > atol_)

    def body(carry):
        j, V, R, g, cs, sn = carry
        w = mv(V[j])
        # unwritten rows of V are zero: full-matrix reorthogonalization is
        # exact under the dynamic step count
        h1 = jnp.conj(V) @ w
        w = w - V.T @ h1
        h2 = jnp.conj(V) @ w
        w = w - V.T @ h2
        hb = jnp.linalg.norm(w)
        V = V.at[j + 1].set(jnp.where(hb > 1e-300,
                                      w / jnp.maximum(hb, 1e-300), 0.0))
        col = (h1 + h2).at[j + 1].set(hb.astype(dt))

        def rot(i, col):
            a, bb = col[i], col[i + 1]
            return (col.at[i].set(cs[i] * a + sn[i] * bb)
                    .at[i + 1].set(-jnp.conj(sn[i]) * a + jnp.conj(cs[i]) * bb))

        col = lax.fori_loop(0, j, rot, col)
        # new rotation zeroing col[j+1]: rows ((conj a, conj b), (-b, a))/d
        a, bb = col[j], col[j + 1]
        d = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(bb) ** 2)
        safe = d > 1e-300
        u = jnp.where(safe, jnp.conj(a) / jnp.maximum(d, 1e-300),
                      jnp.ones((), dt))
        v = jnp.where(safe, jnp.conj(bb) / jnp.maximum(d, 1e-300),
                      jnp.zeros((), dt))
        col = col.at[j].set(d.astype(dt)).at[j + 1].set(0.0)
        gj = g[j]
        g = (g.at[j].set(u * gj)
             .at[j + 1].set(-jnp.conj(v) * gj))
        return (j + 1, V, R.at[:, j].set(col), g,
                cs.at[j].set(u), sn.at[j].set(v))

    j_end, V, R, g, cs, sn = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), V, R, g, cs, sn))
    # masked triangular solve: unit diagonal + zero rhs on unreached rows
    # and on (lucky-)breakdown columns whose pivot collapsed to ~0, where
    # the old SVD lstsq would have dropped the direction
    rows = jnp.arange(k)
    dvec = jnp.abs(jnp.diagonal(R[:k, :k]))
    fix = (rows >= j_end) | (dvec < 1e-30)
    Rm = R[:k, :k] + jnp.diag(jnp.where(fix, 1.0, 0.0).astype(dt))
    gm = jnp.where(fix, 0.0, g[:k])
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    x_new = x + V[:k].T @ y
    resid = jnp.abs(g[j_end])
    return x_new, resid, j_end


@partial(jax.jit, static_argnames=("plan", "k"))
def _gmres_restart_plan(x, b, ops, *, plan, k: int, atol=None):
    return _gmres_restart_core(lambda v: plan.matvec(v, *ops), x, b, k,
                               atol=atol)


def gmres_plan(plan, ops: tuple, b: jnp.ndarray, x0: jnp.ndarray = None,
               krylov_dim: int = 30, tol: float = 1e-12,
               max_restarts: int = 50) -> Tuple[jnp.ndarray, dict]:
    """Solve ``plan.matvec(x, *ops) = b`` with fully-jitted GMRES restarts
    (one dispatch + one scalar host sync per restart); inside a restart the
    device loop exits as soon as the Givens-tracked residual clears
    ``tol * |b|``, so a warm-started solve costs a few matvecs."""
    bnorm = float(jnp.linalg.norm(b))
    if bnorm == 0.0:
        return jnp.zeros_like(b), {"resid": 0.0, "iters": 0}
    x = x0 if x0 is not None else jnp.zeros_like(b)
    res = np.inf
    iters = 0
    atol = jnp.asarray(tol * bnorm)
    for _ in range(max_restarts):
        x, resid, j = _gmres_restart_plan(x, b, ops, plan=plan,
                                          k=krylov_dim, atol=atol)
        iters += int(j)
        res = float(resid) / bnorm
        if res < tol:
            break
    return x, {"resid": res, "iters": iters}


# ----------------------------------------------------------------------
# Lanczos: smallest eigenpair of a Hermitian operator
# ----------------------------------------------------------------------

def lanczos_ground(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                   v0: jnp.ndarray, krylov_dim: int = 16, tol: float = 1e-12,
                   max_restarts: int = 100) -> Tuple[float, jnp.ndarray, dict]:
    """Smallest eigenpair by restarted Lanczos with full reorthogonalization.

    The recurrence keeps everything on the device as 0-d scalars / a fixed
    (k+1, n) basis matrix and synchronizes with the host only once per
    restart (for the small tridiagonal eigenproblem) — per-step host syncs
    would otherwise dominate the matvec cost."""
    n = v0.shape[0]
    v = v0 / jnp.linalg.norm(v0)
    theta = None
    iters = 0
    resid = np.inf
    for _ in range(max_restarts):
        V = jnp.zeros((krylov_dim + 1, n), dtype=v.dtype).at[0].set(v)
        a_dev = []
        b_dev = []
        for j in range(krylov_dim):
            w = matvec(V[j])
            iters += 1
            a_dev.append(jnp.vdot(V[j], w).real)
            # full reorthogonalization against all basis vectors (zero rows
            # beyond j contribute nothing; fixed shapes keep the jit cache hot)
            coeff = jnp.conj(V) @ w
            w = w - V.T @ coeff
            coeff2 = jnp.conj(V) @ w
            w = w - V.T @ coeff2
            b = jnp.linalg.norm(w)
            b_dev.append(b)
            if j < krylov_dim - 1:
                V = V.at[j + 1].set(jnp.where(b > 1e-300, w / b, 0.0))
        # host-side gather (avoid eager jnp.stack: XLA CPU's eager
        # concatenate family has corrupted the heap before, see linalg.pad_leg)
        alphas = np.array([np.asarray(a) for a in a_dev])
        betas = np.array([np.asarray(b) for b in b_dev])
        # effective Krylov size: stop at the first (near-)breakdown
        k = krylov_dim
        for j in range(krylov_dim - 1):
            if betas[j] < 1e-14:
                k = j + 1
                break
        Tm = np.diag(alphas[:k])
        for j in range(k - 1):
            Tm[j, j + 1] = Tm[j + 1, j] = betas[j]
        evals, evecs = np.linalg.eigh(Tm)
        theta = float(evals[0])
        c = jnp.zeros((krylov_dim + 1,), dtype=v.dtype).at[:k].set(
            jnp.asarray(evecs[:, 0]))
        v = V.T @ c
        v = v / jnp.linalg.norm(v)
        resid = abs(betas[k - 1] * float(np.abs(evecs[k - 1, 0])))
        if resid < tol:
            break
    return theta, v, {"resid": float(resid), "iters": iters}


def lanczos_ground_batched(matvec_b: Callable[[jnp.ndarray], jnp.ndarray],
                           V0: jnp.ndarray, krylov_dim: int = 16,
                           tol: float = 1e-12, max_restarts: int = 100
                           ) -> Tuple[np.ndarray, jnp.ndarray, dict]:
    """Smallest eigenpair of K independent Hermitian operators at once.

    ``matvec_b`` maps a [K, n] batch to a [K, n] batch, applying lane k's
    operator to row k (e.g. a vmapped excitation H_eff, one momentum per
    lane); ``V0`` is the [K, n] batch of start vectors.  The recurrence is
    the same restarted, fully-reorthogonalized scheme as
    :func:`lanczos_ground`, vectorized over the lane axis: one batched
    matvec per step instead of K separate solves, one host sync per restart
    (the K small tridiagonal eigenproblems run as a single batched
    ``np.linalg.eigh``).  Lanes converge independently — a converged lane's
    (theta, v) is frozen while the rest keep restarting.

    Returns ``(theta[K], V[K, n], {"resid": [K], "iters": int})``.
    """
    K, n = V0.shape
    v = V0 / jnp.linalg.norm(V0, axis=1, keepdims=True)
    kd = krylov_dim
    theta = np.full(K, np.inf)
    resid = np.full(K, np.inf)
    done = np.zeros(K, dtype=bool)
    iters = 0
    for _ in range(max_restarts):
        V = jnp.zeros((kd + 1, K, n), dtype=v.dtype).at[0].set(v)
        a_dev, b_dev = [], []
        for j in range(kd):
            w = matvec_b(V[j])
            iters += 1
            a_dev.append(jnp.real(jnp.einsum("kn,kn->k", jnp.conj(V[j]), w)))
            # full reorthogonalization per lane (twice, as in the serial path)
            c1 = jnp.einsum("jkn,kn->jk", jnp.conj(V), w)
            w = w - jnp.einsum("jkn,jk->kn", V, c1)
            c2 = jnp.einsum("jkn,kn->jk", jnp.conj(V), w)
            w = w - jnp.einsum("jkn,jk->kn", V, c2)
            b = jnp.linalg.norm(w, axis=1)
            b_dev.append(b)
            if j < kd - 1:
                ok = (b > 1e-300)[:, None]
                V = V.at[j + 1].set(
                    jnp.where(ok, w / jnp.maximum(b, 1e-300)[:, None], 0.0))
        # host gather (numpy concatenation: see lanczos_ground's note on
        # XLA CPU's eager concatenate family)
        alphas = np.stack([np.asarray(a) for a in a_dev], axis=1)  # [K, kd]
        betas = np.stack([np.asarray(b) for b in b_dev], axis=1)   # [K, kd]
        # masked tridiagonal per lane: rows past a breakdown get a +1e30
        # penalty so they never win the eigensolve (as _lanczos_restart_core)
        valid = np.concatenate(
            [np.ones((K, 1), dtype=bool),
             np.cumprod(betas[:, :kd - 1] > 1e-14, axis=1) > 0], axis=1)
        al = np.where(valid, alphas, 1e30)
        bl = np.where(valid[:, 1:], betas[:, :kd - 1], 0.0)
        Tm = np.zeros((K, kd, kd))
        idx = np.arange(kd)
        Tm[:, idx, idx] = al
        if kd > 1:
            i2 = np.arange(kd - 1)
            Tm[:, i2, i2 + 1] = bl
            Tm[:, i2 + 1, i2] = bl
        evals, evecs = np.linalg.eigh(Tm)
        th = evals[:, 0]
        c = np.where(valid, evecs[:, :, 0], 0.0)                   # [K, kd]
        r_new = np.abs(betas[:, kd - 1] * c[:, kd - 1])
        r_new = np.where(valid.all(axis=1), r_new, 0.0)  # breakdown: exact
        v_new = jnp.einsum("jkn,kj->kn", V[:kd],
                           jnp.asarray(c, dtype=v.dtype))
        v_new = v_new / jnp.linalg.norm(v_new, axis=1, keepdims=True)
        keep = jnp.asarray(done)[:, None]
        v = jnp.where(keep, v, v_new)
        theta = np.where(done, theta, th)
        resid = np.where(done, resid, r_new)
        done = done | (resid < tol)
        if done.all():
            break
    return theta, v, {"resid": resid, "iters": iters}


# ----------------------------------------------------------------------
# GMRES: linear solve
# ----------------------------------------------------------------------

def gmres(matvec: Callable[[jnp.ndarray], jnp.ndarray], b: jnp.ndarray,
          x0: jnp.ndarray = None, krylov_dim: int = 30, tol: float = 1e-12,
          max_restarts: int = 50) -> Tuple[jnp.ndarray, dict]:
    """Solve A x = b by restarted GMRES on flat arrays."""
    bnorm = float(jnp.linalg.norm(b))
    if bnorm == 0.0:
        return jnp.zeros_like(b), {"resid": 0.0, "iters": 0}
    n = b.shape[0]
    x = x0 if x0 is not None else jnp.zeros_like(b)
    iters = 0
    res = np.inf
    for _ in range(max_restarts):
        r = b - matvec(x)
        iters += 1
        beta = float(jnp.linalg.norm(r))
        res = beta / bnorm
        if res < tol:
            break
        V = jnp.zeros((krylov_dim + 1, n), dtype=b.dtype).at[0].set(r / beta)
        cols = []
        norms = []
        for j in range(krylov_dim):
            w = matvec(V[j])
            iters += 1
            h = jnp.conj(V) @ w                 # full-width projection
            w = w - V.T @ h
            h2 = jnp.conj(V) @ w
            w = w - V.T @ h2
            hb = jnp.linalg.norm(w)
            cols.append(h + h2)
            norms.append(hb)
            if j < krylov_dim - 1:
                V = V.at[j + 1].set(jnp.where(hb > 1e-300, w / hb, 0.0))
        Hc = np.array([np.asarray(c) for c in cols])   # (k, k+1) host gather
        hn = np.array([np.asarray(x) for x in norms])
        k = krylov_dim
        for j in range(krylov_dim - 1):
            if hn[j] < 1e-14:
                k = j + 1
                break
        H = np.zeros((k + 1, k), dtype=np.complex128)
        for j in range(k):
            H[: j + 1, j] = Hc[j, : j + 1]
            H[j + 1, j] = hn[j]
        e1 = np.zeros(k + 1, dtype=np.complex128)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H, e1, rcond=None)
        yfull = np.zeros(krylov_dim + 1, dtype=np.complex128)
        yfull[:k] = y
        if not np.iscomplexobj(np.zeros((), dtype=b.dtype)):
            yfull = np.real(yfull)
        x = x + V.T @ jnp.asarray(yfull, dtype=b.dtype)
        res = float(np.linalg.norm(H @ y - e1)) / bnorm
        if res < tol:
            break
    return x, {"resid": float(res), "iters": iters}


# ----------------------------------------------------------------------
# Arnoldi: eigenpairs of a general (possibly non-Hermitian) operator
# ----------------------------------------------------------------------

def _arnoldi_factorization(mv, v, k: int):
    """k-step Arnoldi factorization with full reorthogonalization.  The
    recurrence is host-driven (like the generic :func:`lanczos_ground` /
    :func:`gmres`) so ``mv`` may itself contain host-side control flow —
    the excitation H_eff runs inner GMRES solves.  Returns
    ``(V (k+1, n), H (k+1, k))`` with ``A V[:k].T = V.T H`` up to breakdown."""
    n = v.shape[0]
    v = v / jnp.linalg.norm(v)
    V = jnp.zeros((k + 1, n), v.dtype).at[0].set(v)
    H = jnp.zeros((k + 1, k), v.dtype)
    for j in range(k):
        w = mv(V[j])
        h1 = jnp.conj(V) @ w
        w = w - V.T @ h1
        h2 = jnp.conj(V) @ w
        w = w - V.T @ h2
        hb = jnp.linalg.norm(w)
        V = V.at[j + 1].set(jnp.where(hb > 1e-300,
                                      w / jnp.maximum(hb, 1e-300), 0.0))
        col = (h1 + h2).at[j + 1].set(hb.astype(V.dtype))
        H = H.at[:, j].set(col)
        if float(hb) < 1e-14:   # exact invariant subspace: stop early
            break
    return V, H


_ARNOLDI_ORDER = {
    "sr": lambda w: np.real(w),
    "lr": lambda w: -np.real(w),
    "sm": lambda w: np.abs(w),
    "lm": lambda w: -np.abs(w),
}


def arnoldi_eig(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                v0: jnp.ndarray, num: int = 1, krylov_dim: int = 30,
                tol: float = 1e-6, which: str = "sr",
                max_restarts: int = 60) -> Tuple[np.ndarray, list, dict]:
    """``num`` eigenpairs of a general operator by restarted Arnoldi with
    Ritz-vector restarts; converged states are locked and deflated
    (P A P over the orthogonal complement), so each returned pair carries
    its own residual control.  ``which`` targets smallest/largest real part
    ("sr"/"lr") or magnitude ("sm"/"lm").

    TPU-native counterpart of the reference's excitation eigensolver
    ``Arnoldi(krylovdim=30, tol=1e-6, eager=true)``
    (/root/reference/src/HubbardFunctions.jl:1176): the host drives the
    recurrence (the matvec may contain its own host-side solves, as the
    excitation H_eff does), syncs on the small (k+1, k) Hessenberg, and
    checks convergence after every restart as the eager flag does per
    iteration.

    Note eigenVALUES of defective/complex-pair spectra are returned as
    found; for Hermitian operators this agrees with :func:`lanczos_ground`
    (tested) at ~2x the memory (no three-term recurrence shortcut).
    """
    if which not in _ARNOLDI_ORDER:
        raise ValueError(f"which must be one of {sorted(_ARNOLDI_ORDER)}")
    key = _ARNOLDI_ORDER[which]
    k = krylov_dim
    rng = np.random.default_rng(11)
    ws: list = []
    vs: list = []
    total_iters = 0
    last_resid = np.inf
    for m in range(num):
        basis = list(vs)

        def project(x):
            for vi in basis:
                x = x - vi * jnp.vdot(vi, x)
            return x

        def mv_defl(x):
            return project(matvec(project(x)))

        if m == 0:
            v = v0
        else:
            vr = rng.standard_normal(v0.shape[0])
            if jnp.iscomplexobj(v0):
                vr = vr + 1j * rng.standard_normal(v0.shape[0])
            v = jnp.asarray(vr, dtype=v0.dtype)
        v = project(v)
        v = v / jnp.linalg.norm(v)
        w = None
        for _ in range(max_restarts):
            V, Hm = _arnoldi_factorization(mv_defl, v, k)
            Hh = np.asarray(Hm)
            # effective factorization length: stop at the first breakdown
            # (an exact invariant subspace; later columns are garbage)
            keff = k
            for j in range(k - 1):
                if abs(Hh[j + 1, j]) < 1e-14:
                    keff = j + 1
                    break
            w_all, y_all = np.linalg.eig(Hh[:keff, :keff])
            order = np.argsort(key(w_all))
            w = w_all[order[0]]
            y = y_all[:, order[0]]
            y = y / np.linalg.norm(y)
            last_resid = (abs(Hh[keff, keff - 1]) * abs(y[keff - 1])
                          if keff < k + 1 else 0.0)
            yfull = np.zeros(k + 1, dtype=np.complex128)
            yfull[:keff] = y
            if not jnp.iscomplexobj(v):
                yfull = np.real(yfull)
            v = V.T @ jnp.asarray(yfull, dtype=v.dtype)
            v = project(v)
            v = v / jnp.linalg.norm(v)
            total_iters += keff
            if last_resid < tol:
                break
        ws.append(complex(w))
        vs.append(v)
    if num > 1:
        # Orthogonal deflation of a non-normal operator converges SCHUR
        # vectors: A Q = Q T with T upper triangular (up to residual), so
        # the locked q_m (m>0) need not be eigenvectors of A even though
        # the eigenvalues are exact.  Transform: eigenvectors y of the
        # small T = Q^H A Q give genuine eigenpairs (lambda, Q y).
        Aq = [matvec(q) for q in vs]
        T = np.zeros((num, num), dtype=np.complex128)
        for i in range(num):
            for j in range(num):
                T[i, j] = complex(jnp.vdot(vs[i], Aq[j]))
        w_all, Y = np.linalg.eig(T)
        order = np.argsort(key(w_all))
        ws = [complex(w_all[i]) for i in order]
        vs_out = []
        for idx in order:
            y = Y[:, idx]
            v = sum(vs[i] * complex(y[i]) for i in range(num))
            vs_out.append(v / jnp.linalg.norm(v))
        vs = vs_out
    return np.asarray(ws), vs, {"resid": float(last_resid),
                                "iters": total_iters}


def _arnoldi_factorization_batched(mv_b, v: jnp.ndarray, k: int):
    """k-step Arnoldi factorizations of K independent operators at once.

    ``v``: normalized [K, n] start batch; ``mv_b`` maps [K, n] -> [K, n]
    applying lane k's operator to row k.  Same fully-reorthogonalized
    recurrence as :func:`_arnoldi_factorization`, vectorized over the lane
    axis (one batched matvec per step).  A lane that breaks down gets zero
    basis vectors from that step on (its Hessenberg subdiagonal records the
    ~0 norm, which the caller uses to find the effective length).  Returns
    ``(V [k+1, K, n] device, H [K, k+1, k] host)``.
    """
    K, n = v.shape
    V = jnp.zeros((k + 1, K, n), v.dtype).at[0].set(v)
    cols = []
    for j in range(k):
        w = mv_b(V[j])
        h1 = jnp.einsum("jkn,kn->jk", jnp.conj(V), w)
        w = w - jnp.einsum("jkn,jk->kn", V, h1)
        h2 = jnp.einsum("jkn,kn->jk", jnp.conj(V), w)
        w = w - jnp.einsum("jkn,jk->kn", V, h2)
        hb = jnp.linalg.norm(w, axis=1)
        ok = (hb > 1e-300)[:, None]
        V = V.at[j + 1].set(
            jnp.where(ok, w / jnp.maximum(hb, 1e-300)[:, None], 0.0))
        cols.append((h1 + h2, hb))
    H = np.zeros((K, k + 1, k), dtype=np.complex128)
    for j, (h, hb) in enumerate(cols):
        # host gather per column (numpy: see lanczos_ground's note on XLA
        # CPU's eager concatenate family)
        hh = np.asarray(h).T                       # [K, k+1]
        H[:, :j + 1, j] = hh[:, :j + 1]
        H[:, j + 1, j] = np.asarray(hb)
    return V, H


def arnoldi_eig_batched(matvec_b: Callable[[jnp.ndarray], jnp.ndarray],
                        V0: jnp.ndarray, num: int = 1, krylov_dim: int = 30,
                        tol: float = 1e-6, which: str = "sr",
                        max_restarts: int = 60
                        ) -> Tuple[np.ndarray, list, dict]:
    """Momentum-batched counterpart of :func:`arnoldi_eig`: ``num``
    eigenpairs of K independent general operators, one batched Arnoldi
    factorization driving every lane per restart.  Lanes converge
    independently (a converged lane's Ritz pair is frozen while the rest
    keep restarting); the per-state orthogonal deflation and the final
    Schur-vector -> eigenvector transform mirror the serial path per lane.

    Returns ``(ws [K, num], [v_m [K, n] for m in range(num)],
    {"resid": [K], "iters": int})``.
    """
    if which not in _ARNOLDI_ORDER:
        raise ValueError(f"which must be one of {sorted(_ARNOLDI_ORDER)}")
    key = _ARNOLDI_ORDER[which]
    k = krylov_dim
    K, n = V0.shape
    rng = np.random.default_rng(11)
    ws_all = np.zeros((K, num), dtype=np.complex128)
    locked: list = []
    total_iters = 0
    last_resid = np.full(K, np.inf)
    for m in range(num):
        basis = jnp.stack(locked, axis=1) if locked else None  # [K, m, n]

        def project(X, _basis=basis):
            if _basis is None:
                return X
            c = jnp.einsum("kmn,kn->km", jnp.conj(_basis), X)
            return X - jnp.einsum("kmn,km->kn", _basis, c)

        def mv_defl(X, _project=project):
            return _project(matvec_b(_project(X)))

        if m == 0:
            v = V0
        else:
            vr = rng.standard_normal((K, n))
            if jnp.iscomplexobj(V0):
                vr = vr + 1j * rng.standard_normal((K, n))
            v = jnp.asarray(vr, dtype=V0.dtype)
        v = project(v)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        done = np.zeros(K, dtype=bool)
        w_cur = np.zeros(K, dtype=np.complex128)
        last_resid = np.full(K, np.inf)
        for _ in range(max_restarts):
            V, Hh = _arnoldi_factorization_batched(mv_defl, v, k)
            yfull = np.zeros((K, k + 1), dtype=np.complex128)
            for lane in range(K):
                if done[lane]:
                    continue
                Hl = Hh[lane]
                keff = k
                for j in range(k - 1):
                    if abs(Hl[j + 1, j]) < 1e-14:
                        keff = j + 1
                        break
                w_l, y_l = np.linalg.eig(Hl[:keff, :keff])
                order = np.argsort(key(w_l))
                w_cur[lane] = w_l[order[0]]
                y = y_l[:, order[0]]
                y = y / np.linalg.norm(y)
                last_resid[lane] = abs(Hl[keff, keff - 1]) * abs(y[keff - 1])
                yfull[lane, :keff] = y
                total_iters += keff
            if not jnp.iscomplexobj(v):
                yfull = np.real(yfull)
            v_new = jnp.einsum("jkn,kj->kn", V,
                               jnp.asarray(yfull, dtype=v.dtype))
            v_new = project(v_new)
            nrm = jnp.linalg.norm(v_new, axis=1, keepdims=True)
            v_new = v_new / jnp.maximum(nrm, 1e-300)
            v = jnp.where(jnp.asarray(done)[:, None], v, v_new)
            done = done | (last_resid < tol)
            if done.all():
                break
        ws_all[:, m] = w_cur
        locked.append(v)
    if num > 1:
        # per lane: orthogonal deflation of a non-normal operator converges
        # SCHUR vectors; transform through T = Q^H A Q to genuine eigenpairs
        # (see arnoldi_eig)
        Aq = [matvec_b(q) for q in locked]
        T = np.zeros((K, num, num), dtype=np.complex128)
        for i in range(num):
            for j in range(num):
                T[:, i, j] = np.asarray(
                    jnp.einsum("kn,kn->k", jnp.conj(locked[i]), Aq[j]))
        Q = jnp.stack(locked, axis=1)                       # [K, num, n]
        vs_out = [jnp.zeros_like(locked[0]) for _ in range(num)]
        for lane in range(K):
            w_l, Y = np.linalg.eig(T[lane])
            order = np.argsort(key(w_l))
            ws_all[lane, :] = w_l[order]
            for s, idx in enumerate(order):
                y = jnp.asarray(Y[:, idx], dtype=V0.dtype)
                vl = jnp.einsum("mn,m->n", Q[lane], y)
                vs_out[s] = vs_out[s].at[lane].set(
                    vl / jnp.linalg.norm(vl))
        locked = vs_out
    return ws_all, locked, {"resid": last_resid, "iters": total_iters}
