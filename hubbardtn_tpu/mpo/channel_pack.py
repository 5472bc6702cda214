"""Channel-packed MPO: batch FSM channels into block-sparse channel legs.

The FSM MPO keeps one dict entry per automaton channel; the hot effective-
Hamiltonian matvecs then issue one small GEMM chain per (transition, block)
pair.  On the MXU that leaves throughput on the table: channels that carry
the SAME charge (e.g. the four hopping channels of the Hubbard chain, or
every Z-string continuation of a long-range term) can ride one *channel
leg* whose sector multiplicity counts them, turning the per-channel loop
into a few large batched ``dot_general``s — the block-sparse-MPO storage of
BlockTensorKit (reference dependency, SURVEY.md 2B) mapped to TPU.

The packed objects reuse the explicit-channel-leg contraction conventions
of the SU(2) backend (see algorithms/vumps.py, 4-leg branch):

* packed W:   (ch_a OUT, p OUT, p IN, ch_b IN), neutral;
* packed GL:  (bra IN, ket OUT, ch IN),  neutral;
* packed GR:  (ket IN, bra OUT, ch OUT), neutral;

so ``apply_H_AC({0: GL3}, {(0, 0): W4}, {0: GR3}, AC)`` IS the batched
matvec — no new contraction code.

Only the abelian backend packs for now (SU(2) W entries are already
4-leg; stacking their channel legs is a planned follow-up).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..symmetry.groups import Sector
from ..symmetry.spaces import Space
from ..tensor.symtensor import IN, OUT, SymTensor
from .fsm import MPOHamiltonian


class ChannelMap:
    """Layout of one bond's channels on a channel leg: channels with equal
    charge occupy consecutive multiplicity slots of that charge's sector."""

    __slots__ = ("charges", "space", "slot")

    def __init__(self, charges: List[Sector]):
        self.charges = [tuple(q) for q in charges]
        counts: Dict[Sector, int] = {}
        slot: List[Tuple[Sector, int]] = []
        for q in self.charges:
            k = counts.get(q, 0)
            slot.append((q, k))
            counts[q] = k + 1
        self.slot = slot                      # channel index -> (sector, offset)
        self.space: Optional[Space] = None

    def build_space(self, group) -> Space:
        counts: Dict[Sector, int] = {}
        for q in self.charges:
            counts[q] = counts.get(q, 0) + 1
        self.space = Space(group, counts)
        return self.space


class PackedMPO:
    """Per-site packed W tensors + per-bond channel maps."""

    def __init__(self, H: MPOHamiltonian):
        g = H.site.group
        self.group = g
        self.T = H.T
        self.site = H.site
        self.maps: List[ChannelMap] = []
        for bond in range(H.T):
            m = ChannelMap(H.charges[bond])
            m.build_space(g)
            self.maps.append(m)
        self.Ws: List[SymTensor] = []
        p_space = H.site.space
        for x in range(H.T):
            ma, mb = self.maps[x], self.maps[(x + 1) % H.T]
            spaces = (ma.space, p_space, p_space, mb.space)
            arrows = (OUT, OUT, IN, IN)
            W4 = SymTensor.zeros(g, spaces, arrows, fill=False)
            blocks: Dict = {}
            for (a, b), op in H.Ws[x].items():
                qa, oa = ma.slot[a]
                qb, ob = mb.slot[b]
                for (po, pi), blk in op.blocks.items():
                    key = (qa, po, pi, qb)
                    if key not in blocks:
                        shape = W4.key_shape(key)
                        blocks[key] = np.zeros(shape, dtype=np.complex128
                                               if op.dtype.kind == "c"
                                               else np.float64)
                    blocks[key][oa, :, :, ob] += np.asarray(blk)
            for key, arr in blocks.items():
                W4.blocks[key] = jnp.asarray(arr)
            self.Ws.append(W4)

    def pack_env_left(self, GL: Dict[int, SymTensor], bond: int) -> SymTensor:
        """Dict of charged 2-leg GL[a] -> one neutral 3-leg (bra, ket, ch IN).

        jit-friendly: pure stacking of existing blocks (static layout)."""
        m = self.maps[bond % self.T]
        g = self.group
        t0 = next(iter(GL.values()))
        spaces = (t0.spaces[0], t0.spaces[1], m.space)
        out = SymTensor.zeros(g, spaces, (IN, OUT, IN), fill=False)
        groups: Dict = {}
        for a, t in GL.items():
            qa, oa = m.slot[a]
            for (qb_, qk_), blk in t.blocks.items():
                groups.setdefault(((qb_, qk_, qa)), []).append((oa, blk))
        for key, items in groups.items():
            out.blocks[key] = _stack_cols(items, m.space.dim_of(key[2]),
                                          out.key_shape(key), t0.dtype)
        return out

    def pack_env_right(self, GR: Dict[int, SymTensor], bond: int) -> SymTensor:
        """Dict of charged 2-leg GR[b] -> one neutral 3-leg (ket, bra, ch OUT)."""
        m = self.maps[bond % self.T]
        g = self.group
        t0 = next(iter(GR.values()))
        spaces = (t0.spaces[0], t0.spaces[1], m.space)
        out = SymTensor.zeros(g, spaces, (IN, OUT, OUT), fill=False)
        groups: Dict = {}
        for b, t in GR.items():
            qb, ob = m.slot[b]
            for (qk_, qb_), blk in t.blocks.items():
                groups.setdefault(((qk_, qb_, qb)), []).append((ob, blk))
        for key, items in groups.items():
            out.blocks[key] = _stack_cols(items, m.space.dim_of(key[2]),
                                          out.key_shape(key), t0.dtype)
        return out

def _stack_cols(items, n, shape, dtype):
    """Stack per-channel 2-leg blocks along a new channel axis.  Host-side
    numpy when operands are concrete (one device transfer per 3-leg block
    instead of per channel); jnp under tracing."""
    import jax as _jax
    eager = not any(isinstance(b, _jax.core.Tracer) for _, b in items)
    if eager:
        # stay on the host: downstream consumers (batched_hac stacking, or
        # a single device_put of the whole env) decide when to transfer
        buf = np.zeros(shape[:2] + (n,), dtype=np.dtype(jnp.dtype(dtype).name))
        for off, blk in items:
            buf[:, :, off] = np.asarray(blk)
        return buf
    cols = [None] * n
    for off, blk in items:
        cols[off] = blk
    zero = jnp.zeros(shape[:2], dtype=dtype)
    return jnp.stack([c if c is not None else zero for c in cols], axis=2)
