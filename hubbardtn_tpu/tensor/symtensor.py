"""Block-sparse abelian-symmetric tensors on TPU.

TPU-native replacement for TensorKit's ``TensorMap`` (the reference constructs
and contracts these at /root/reference/src/HubbardFunctions.jl:257-382 and
throughout MPSKit).  Design per SURVEY.md section 2B:

* the *block table* (which symmetry sectors appear on each leg, and with what
  multiplicity) is static Python metadata -- hashable, known at trace time;
* the *block data* are ``jax`` arrays registered as pytree leaves, so whole
  algorithm iterations (VUMPS steps, Lanczos sweeps) jit into single XLA
  programs whose contractions lower to ``dot_general`` on the MXU.

Fermionic statistics are NOT handled here: the MPO compiler inserts
Jordan-Wigner strings (see ``ops/fermions.py``), so every tensor in the
network is an ordinary graded tensor and contraction needs no braiding signs.
This is the key simplification that keeps the hot path pure batched matmul.

Conventions
-----------
Each leg has an ``arrow``: ``IN`` (accepts charge) or ``OUT`` (emits charge).
A block with sector key ``(q_1, ..., q_n)`` is allowed iff::

    sum_{out legs} q_i  -  sum_{in legs} q_i  ==  tensor.charge

(in group arithmetic).  Contraction pairs an OUT leg with an IN leg carrying
equal sector labels.  ``flip_arrow`` relabels ``q -> dual(q)`` on one leg
(a pure bookkeeping move for abelian groups, no data change).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import AbelianGroup, Sector
from ..symmetry.spaces import Space

IN = False
OUT = True

Key = Tuple[Sector, ...]


def _flux(group: AbelianGroup, arrows: Sequence[bool], key: Key) -> Sector:
    out = group.trivial
    for arrow, q in zip(arrows, key):
        out = group.fuse(out, q if arrow == OUT else group.dual(q))
    return out


class SymTensor:
    __slots__ = ("group", "spaces", "arrows", "charge", "blocks", "dtype")

    def __init__(
        self,
        group: AbelianGroup,
        spaces: Sequence[Space],
        arrows: Sequence[bool],
        blocks: Dict[Key, jnp.ndarray],
        charge: Optional[Sector] = None,
        dtype=None,
    ):
        self.group = group
        self.spaces = tuple(spaces)
        self.arrows = tuple(bool(a) for a in arrows)
        self.charge = tuple(charge) if charge is not None else group.trivial
        self.blocks = blocks
        if dtype is None:
            dtype = next(iter(blocks.values())).dtype if blocks else jnp.float64
        # canonicalize against the x64 setting: without it a tensor
        # built with a float64 request on a non-x64 runtime would
        # DECLARE float64 while its blocks are truncated to float32,
        # and the declared dtype is pytree metadata - mixed declared
        # dtypes then break lax.cond/scan branch matching on TPU
        import jax as _jax
        self.dtype = jnp.dtype(_jax.dtypes.canonicalize_dtype(dtype))

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def zeros(cls, group, spaces, arrows, charge=None, dtype=jnp.float64, fill=True):
        t = cls(group, spaces, arrows, {}, charge, dtype)
        if fill:
            for key in t.allowed_keys():
                t.blocks[key] = jnp.zeros(t.key_shape(key), dtype=dtype)
        return t

    @classmethod
    def random(cls, group, spaces, arrows, charge=None, dtype=jnp.float64, seed=0):
        t = cls(group, spaces, arrows, {}, charge, dtype)
        rng = np.random.default_rng(seed)
        for key in t.allowed_keys():
            arr = rng.standard_normal(t.key_shape(key))
            if jnp.dtype(dtype).kind == "c":
                arr = arr + 1j * rng.standard_normal(t.key_shape(key))
            t.blocks[key] = jnp.asarray(arr, dtype=dtype)
        return t

    @classmethod
    def from_blocks(cls, group, spaces, arrows, blocks, charge=None, dtype=None):
        """Build from a dict of numpy/jax blocks, validating keys and shapes."""
        t = cls(group, spaces, arrows, {}, charge, dtype or None)
        if dtype is None and blocks:
            dtype = jnp.result_type(*[np.asarray(b).dtype for b in blocks.values()])
            t.dtype = jnp.dtype(dtype)
        for key, arr in blocks.items():
            key = tuple(tuple(int(x) for x in q) for q in key)
            if not t.key_allowed(key):
                raise ValueError(f"block key {key} violates charge conservation (charge={t.charge})")
            arr = jnp.asarray(arr, dtype=t.dtype)
            if arr.shape != t.key_shape(key):
                raise ValueError(f"block {key}: shape {arr.shape} != {t.key_shape(key)}")
            t.blocks[key] = arr
        return t

    # ------------------------------------------------------------------
    # block-table queries (static / trace-time)
    # ------------------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.spaces)

    def key_shape(self, key: Key) -> Tuple[int, ...]:
        return tuple(sp.dim_of(q) for sp, q in zip(self.spaces, key))

    def key_allowed(self, key: Key) -> bool:
        for sp, q in zip(self.spaces, key):
            if sp.dim_of(q) == 0:
                return False
        return _flux(self.group, self.arrows, key) == self.charge

    def allowed_keys(self) -> List[Key]:
        """Enumerate conserving keys (product over legs, filtered by flux)."""
        keys: List[Key] = []

        def rec(i: int, partial: Key, flux: Sector):
            if i == self.ndim:
                if flux == self.charge:
                    keys.append(partial)
                return
            sp, arrow = self.spaces[i], self.arrows[i]
            for q, _ in sp:
                qq = q if arrow == OUT else self.group.dual(q)
                rec(i + 1, partial + (q,), self.group.fuse(flux, qq))

        rec(0, (), self.group.trivial)
        return keys

    def structure(self):
        """Hashable static signature (used to key jit caches)."""
        return (self.spaces, self.arrows, self.charge, tuple(sorted(self.blocks.keys())), str(self.dtype))

    # ------------------------------------------------------------------
    # elementwise / linear ops
    # ------------------------------------------------------------------
    def copy(self) -> "SymTensor":
        return SymTensor(self.group, self.spaces, self.arrows, dict(self.blocks), self.charge, self.dtype)

    def _like(self, blocks, spaces=None, arrows=None, charge=None, dtype=None) -> "SymTensor":
        return SymTensor(
            self.group,
            spaces if spaces is not None else self.spaces,
            arrows if arrows is not None else self.arrows,
            blocks,
            charge if charge is not None else self.charge,
            dtype if dtype is not None else self.dtype,
        )

    def __add__(self, other: "SymTensor") -> "SymTensor":
        assert self.spaces == other.spaces and self.arrows == other.arrows and self.charge == other.charge
        out = dict(self.blocks)
        for k, b in other.blocks.items():
            out[k] = out[k] + b if k in out else b
        return self._like(out, dtype=jnp.result_type(self.dtype, other.dtype))

    def __sub__(self, other: "SymTensor") -> "SymTensor":
        return self + (other * (-1.0))

    def __mul__(self, scalar) -> "SymTensor":
        return self._like({k: b * scalar for k, b in self.blocks.items()},
                          dtype=jnp.result_type(self.dtype, jnp.asarray(scalar).dtype))

    __rmul__ = __mul__

    def __neg__(self) -> "SymTensor":
        return self * (-1.0)

    def astype(self, dtype) -> "SymTensor":
        return self._like({k: b.astype(dtype) for k, b in self.blocks.items()}, dtype=dtype)

    def conj(self) -> "SymTensor":
        """Complex conjugate: flips all arrows, dualizes the charge, keeps keys."""
        return SymTensor(
            self.group,
            self.spaces,
            tuple(not a for a in self.arrows),
            {k: jnp.conj(b) for k, b in self.blocks.items()},
            self.group.dual(self.charge),
            self.dtype,
        )

    def transpose(self, perm: Sequence[int]) -> "SymTensor":
        perm = tuple(perm)
        return SymTensor(
            self.group,
            tuple(self.spaces[i] for i in perm),
            tuple(self.arrows[i] for i in perm),
            {tuple(k[i] for i in perm): jnp.transpose(b, perm) for k, b in self.blocks.items()},
            self.charge,
            self.dtype,
        )

    def flip_arrow(self, leg: int) -> "SymTensor":
        """Relabel sectors q -> dual(q) on one leg and flip its arrow (no data change)."""
        g = self.group
        spaces = list(self.spaces)
        spaces[leg] = spaces[leg].dual()
        arrows = list(self.arrows)
        arrows[leg] = not arrows[leg]
        blocks = {}
        for k, b in self.blocks.items():
            kk = list(k)
            kk[leg] = g.dual(kk[leg])
            blocks[tuple(kk)] = b
        return SymTensor(g, spaces, arrows, blocks, self.charge, self.dtype)

    def norm_sq(self):
        if not self.blocks:
            return jnp.zeros((), dtype=jnp.float64)
        parts = [jnp.sum(jnp.abs(b) ** 2) for b in self.blocks.values()]
        if not any(isinstance(p, jax.core.Tracer) for p in parts):
            # eager sum on the host (eager jnp.stack = heap-corruption family)
            return jnp.asarray(sum(float(np.asarray(p)) for p in parts))
        return jnp.sum(jnp.stack(parts))

    def norm(self):
        return jnp.sqrt(self.norm_sq())

    def inner(self, other: "SymTensor"):
        """<self|other> = sum conj(self) * other over matching blocks."""
        acc = None
        for k, b in self.blocks.items():
            o = other.blocks.get(k)
            if o is None:
                continue
            v = jnp.sum(jnp.conj(b) * o)
            acc = v if acc is None else acc + v
        if acc is None:
            return jnp.zeros((), dtype=jnp.result_type(self.dtype, other.dtype))
        return acc

    def real_part(self) -> "SymTensor":
        return self._like({k: jnp.real(b) for k, b in self.blocks.items()},
                          dtype=jnp.real(jnp.zeros((), self.dtype)).dtype)

    def drop_zero_blocks(self, tol: float = 0.0) -> "SymTensor":
        """Remove blocks that are numerically zero (host-side; not jittable)."""
        out = {}
        for k, b in self.blocks.items():
            if float(jnp.max(jnp.abs(b))) > tol:
                out[k] = b
        return self._like(out)

    # --- FusionTensor-compatible no-ops (abelian charges are exact) -----
    def scalar(self):
        """Value of a fully-contracted (0-leg) tensor."""
        b = self.blocks.get(())
        return b if b is not None else jnp.zeros((), dtype=self.dtype)

    def project_charge(self, charge) -> "SymTensor":
        keep = tuple(charge) if charge and isinstance(charge[0], tuple) \
            else (tuple(charge),)
        if self.charge in keep:
            return self
        return self._like({}, charge=keep[0])

    def project_like(self, template: "SymTensor") -> "SymTensor":
        return self.project_charge((template.charge,))

    # ------------------------------------------------------------------
    # dense conversion (tests / debugging only)
    # ------------------------------------------------------------------
    def to_dense(self) -> np.ndarray:
        shape = tuple(sp.total_dim for sp in self.spaces)
        out = np.zeros(shape, dtype=self.dtype)
        offs = [sp.offsets() for sp in self.spaces]
        for key, b in self.blocks.items():
            slc = tuple(slice(offs[i][q], offs[i][q] + self.spaces[i].dim_of(q)) for i, q in enumerate(key))
            out[slc] = np.asarray(b)
        return out

    @classmethod
    def from_dense(cls, group, spaces, arrows, dense, charge=None, dtype=None, tol=1e-14):
        dense = np.asarray(dense)
        dtype = dtype or dense.dtype
        t = cls(group, spaces, arrows, {}, charge, dtype)
        offs = [sp.offsets() for sp in t.spaces]
        for key in t.allowed_keys():
            slc = tuple(slice(offs[i][q], offs[i][q] + t.spaces[i].dim_of(q)) for i, q in enumerate(key))
            blk = dense[slc]
            if np.max(np.abs(blk)) > tol:
                t.blocks[key] = jnp.asarray(blk, dtype=dtype)
        # verify nothing outside allowed blocks
        recon = t.to_dense()
        if not np.allclose(recon, dense, atol=1e-12 * max(1.0, float(np.max(np.abs(dense))))):
            raise ValueError("dense tensor has weight outside charge-conserving blocks")
        return t

    def __repr__(self):  # pragma: no cover - cosmetic
        return (f"SymTensor(ndim={self.ndim}, charge={self.charge}, "
                f"nblocks={len(self.blocks)}, dtype={self.dtype})")


# ----------------------------------------------------------------------
# contraction
# ----------------------------------------------------------------------

def tensordot(A, B, axes):
    """Charge-conserving tensordot.  Contracted legs must carry equal sector
    labels and opposite arrows.  Free legs keep their order (A's then B's),
    matching ``jnp.tensordot`` semantics.  Dispatches to the fusion-tree
    engine when operands are FusionTensors (SU(2) groups)."""
    if not isinstance(A, SymTensor):
        from .fusion import fusion_tensordot
        return fusion_tensordot(A, B, axes)
    return _abelian_tensordot(A, B, axes)


def _abelian_tensordot(A: SymTensor, B: SymTensor, axes) -> SymTensor:
    if isinstance(axes, int):
        axA = list(range(A.ndim - axes, A.ndim))
        axB = list(range(axes))
    else:
        axA, axB = list(axes[0]), list(axes[1])
    assert len(axA) == len(axB)
    for i, j in zip(axA, axB):
        if A.spaces[i] != B.spaces[j]:
            raise ValueError(f"contracted legs {i},{j} have different spaces:\n {A.spaces[i]}\n {B.spaces[j]}")
        if A.arrows[i] == B.arrows[j]:
            raise ValueError(f"contracted legs {i},{j} have same arrow; flip_arrow first")

    freeA = [i for i in range(A.ndim) if i not in axA]
    freeB = [j for j in range(B.ndim) if j not in axB]
    g = A.group

    bmap = defaultdict(list)
    for kB, b in B.blocks.items():
        sig = tuple(kB[j] for j in axB)
        bmap[sig].append((tuple(kB[j] for j in freeB), b))

    out_blocks: Dict[Key, jnp.ndarray] = {}
    for kA, a in A.blocks.items():
        sig = tuple(kA[i] for i in axA)
        kA_free = tuple(kA[i] for i in freeA)
        for kB_free, b in bmap.get(sig, ()):
            kO = kA_free + kB_free
            m = jnp.tensordot(a, b, (axA, axB))
            if kO in out_blocks:
                out_blocks[kO] = out_blocks[kO] + m
            else:
                out_blocks[kO] = m

    return SymTensor(
        g,
        tuple(A.spaces[i] for i in freeA) + tuple(B.spaces[j] for j in freeB),
        tuple(A.arrows[i] for i in freeA) + tuple(B.arrows[j] for j in freeB),
        out_blocks,
        g.fuse(A.charge, B.charge),
        jnp.result_type(A.dtype, B.dtype),
    )


def trace_all(A: SymTensor) -> jnp.ndarray:
    """Full trace of a 2-leg tensor (legs must be contractable with each other)."""
    assert A.ndim == 2 and A.arrows[0] != A.arrows[1]
    acc = jnp.zeros((), dtype=A.dtype)
    for (q0, q1), b in A.blocks.items():
        if q0 == q1:
            acc = acc + jnp.trace(b)
    return acc


# ----------------------------------------------------------------------
# pytree registration: block data are leaves, block tables are aux data
# ----------------------------------------------------------------------

def _flatten(t: SymTensor):
    keys = tuple(sorted(t.blocks.keys()))
    children = tuple(t.blocks[k] for k in keys)
    aux = (t.group, t.spaces, t.arrows, t.charge, keys, str(t.dtype))
    return children, aux


def _unflatten(aux, children):
    group, spaces, arrows, charge, keys, dtype = aux
    return SymTensor(group, spaces, arrows, dict(zip(keys, children)), charge, dtype)


jax.tree_util.register_pytree_node(SymTensor, _flatten, _unflatten)
