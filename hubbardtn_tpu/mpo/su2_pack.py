"""Channel-stacked SU(2) MPO: equal-charge channels ride one channel leg.

The SU(2) FSM MPO (mpo/su2_compile.py) keeps one 4-leg FusionTensor per
automaton transition, each with 1-dim channel legs; the effective-
Hamiltonian matvecs then loop transitions and issue one fusion-tree
contraction per (transition, block pair) — thousands of tiny ops at real
bond dimensions.  Following the abelian design (mpo/channel_pack.py),
channels whose charge coincides stack into multiplicity slots of ONE
channel-leg sector, so

    apply_H_AC({0: GL3}, {(0, 0): W4}, {0: GR3}, AC)

becomes the whole matvec: three fusion-tree contractions over large
multiplicity-carrying blocks.  Fusion trees depend only on the leg sector
charges, so per-channel block keys align slot-for-slot with the stacked
keys — the packing is exact.

Reference parity: this realizes BlockTensorKit's block-sparse MPO storage
(SURVEY.md section 2B) for the non-abelian backend, the reference's
DEFAULT symmetry setting (src/HubbardFunctions.jl:245-255).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor.fusion import FusionTensor
from .channel_pack import ChannelMap
from .fsm import MPOHamiltonian


class PackedMPOSU2:
    """Per-site channel-stacked W tensors + per-bond channel maps."""

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
        p_space = H.site.space
        self.Ws: List[FusionTensor] = []
        from ..tensor.symtensor import IN, OUT
        for x in range(H.T):
            ma, mb = self.maps[x], self.maps[(x + 1) % H.T]
            W4 = FusionTensor(g, (ma.space, p_space, p_space, mb.space),
                              (OUT, OUT, IN, IN), {}, None, jnp.float64)
            bufs: Dict = {}
            for (a, b), op in H.Ws[x].items():
                qa, oa = ma.slot[a]
                qb, ob = mb.slot[b]
                for (k4, c, t), blk in op.blocks.items():
                    assert k4[0] == qa and k4[3] == qb, \
                        "channel-leg sector mismatch in SU(2) W packing"
                    key = ((qa, k4[1], k4[2], qb), c, t)
                    if key not in bufs:
                        arr = np.asarray(blk)
                        bufs[key] = np.zeros(W4.key_shape(key),
                                             dtype=arr.dtype)
                    bufs[key][oa, :, :, ob] += np.asarray(blk)[0, :, :, 0]
            for key, arr in bufs.items():
                W4.blocks[key] = jnp.asarray(arr)
            self.Ws.append(W4)

    def _pack_env(self, env: Dict[int, FusionTensor], bond: int,
                  ch_axis_arrow_in: bool) -> FusionTensor:
        """Stack per-channel 3-leg envs into one (.., .., ch) FusionTensor."""
        m = self.maps[bond % self.T]
        g = self.group
        t0 = next(iter(env.values()))
        from ..tensor.symtensor import IN, OUT
        arrows = (t0.arrows[0], t0.arrows[1],
                  IN if ch_axis_arrow_in else OUT)
        spaces = (t0.spaces[0], t0.spaces[1], m.space)
        out = FusionTensor(g, spaces, arrows, {}, None, t0.dtype)
        eager = not any(isinstance(b, jax.core.Tracer)
                        for t in env.values() for b in t.blocks.values())
        groups: Dict = {}
        for a, t in env.items():
            qa, oa = m.slot[a]
            for (k3, c, tr), blk in t.blocks.items():
                key = ((k3[0], k3[1], qa), c, tr)
                groups.setdefault(key, []).append((oa, blk))
        for key, items in groups.items():
            shape = out.key_shape(key)
            if eager:
                buf = np.zeros(shape, dtype=jnp.dtype(t0.dtype).name)
                for oa, blk in items:
                    buf[:, :, oa] += np.asarray(blk)[:, :, 0]
                out.blocks[key] = jnp.asarray(buf)
            else:
                buf = jnp.zeros(shape, dtype=t0.dtype)
                for oa, blk in items:
                    buf = buf.at[:, :, oa].add(blk[:, :, 0])
                out.blocks[key] = buf
        return out

    def pack_env_left(self, GL: Dict[int, FusionTensor],
                      bond: int) -> FusionTensor:
        """GL[a] (bra IN, ket OUT, ch IN) -> one (bra, ket, ch IN)."""
        return self._pack_env(GL, bond, ch_axis_arrow_in=True)

    def pack_env_right(self, GR: Dict[int, FusionTensor],
                       bond: int) -> FusionTensor:
        """GR[b] (ket IN, bra OUT, ch OUT) -> one (ket, bra, ch OUT)."""
        return self._pack_env(GR, bond, ch_axis_arrow_in=False)
