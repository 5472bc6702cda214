"""SU(2) channel stacking: packed matvec == per-transition dict path."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.vumps import apply_H_AC, apply_H_C
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mpo.su2_pack import PackedMPOSU2
from hubbardtn_tpu.mps.imps import initialize_mps
from hubbardtn_tpu.ops.sites_su2 import channel_space
from hubbardtn_tpu.solvers.krylov import Packer, full_blocks
from hubbardtn_tpu.tensor.fusion import FusionTensor
from hubbardtn_tpu.tensor.symtensor import IN, OUT


def _setup():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=6,
                         seed=1)
    g = H.site.group
    Vl, Vr = psi.ALs[0].spaces[0], psi.ALs[0].spaces[2]
    GL = {a: FusionTensor.random(g, (Vl, Vl, channel_space(g, qa)),
                                 (IN, OUT, IN), seed=a)
          for a, qa in enumerate(H.charges[0])}
    GR = {b: FusionTensor.random(g, (Vr, Vr, channel_space(g, qb)),
                                 (IN, OUT, OUT), seed=50 + b)
          for b, qb in enumerate(H.charges[1])}
    return H, psi, GL, GR


@pytest.mark.heavy
def test_su2_packed_matvec_matches():
    H, psi, GL, GR = _setup()
    AC = full_blocks(psi.AC(0))
    ref = full_blocks(apply_H_AC(GL, H.Ws[0], GR, AC))
    pm = PackedMPOSU2(H)
    GL3 = pm.pack_env_left(GL, 0)
    GR3 = pm.pack_env_right(GR, 1)
    out = full_blocks(apply_H_AC({0: GL3}, {(0, 0): pm.Ws[0]}, {0: GR3}, AC))
    pk = Packer(ref)
    np.testing.assert_allclose(np.asarray(pk.pack(out)),
                               np.asarray(pk.pack(ref)), atol=1e-12)


@pytest.mark.heavy
def test_su2_packed_hc_matches():
    H, psi, GL, GR = _setup()
    g = H.site.group
    Vr = psi.ALs[0].spaces[2]
    GL1 = {a: FusionTensor.random(g, (Vr, Vr, channel_space(g, qa)),
                                  (IN, OUT, IN), seed=70 + a)
           for a, qa in enumerate(H.charges[1])}
    C = full_blocks(psi.Cs[0])
    ref = full_blocks(apply_H_C(GL1, GR, C))
    pm = PackedMPOSU2(H)
    out = full_blocks(apply_H_C({0: pm.pack_env_left(GL1, 1)},
                                {0: pm.pack_env_right(GR, 1)}, C))
    pk = Packer(ref)
    np.testing.assert_allclose(np.asarray(pk.pack(out)),
                               np.asarray(pk.pack(ref)), atol=1e-12)


# (trajectory-level equality of the packed vs dict VUMPS paths lives in
# tests/test_batched_fusion.py, which exercises the full bucketed kernels)
