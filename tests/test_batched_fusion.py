"""Bucketed batched SU(2) fusion contractions == the dict path, exactly."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_fusion import PaddedHACSU2, PaddedHCSU2
from hubbardtn_tpu.algorithms.vumps import apply_H_AC, apply_H_C, vumps
from hubbardtn_tpu.models.hubbard import OBSim, MBSim, hamiltonian
from hubbardtn_tpu.mpo.su2_pack import PackedMPOSU2
from hubbardtn_tpu.mps.imps import initialize_mps
from hubbardtn_tpu.ops.sites_su2 import channel_space
from hubbardtn_tpu.solvers.krylov import full_blocks
from hubbardtn_tpu.tensor.fusion import FusionTensor
from hubbardtn_tpu.tensor.symtensor import IN, OUT


def _setup(sim):
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
          for b, qb in enumerate(H.charges[1 % H.T])}
    return H, psi, GL, GR


@pytest.mark.parametrize("simf", [
    lambda: OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True),
    lambda: MBSim(t=np.array([[0.0, 0.5], [0.5, 0.3]]),
                  u=np.diag([2.0, 1.5]), J=np.zeros((2, 2)),
                  P=2, Q=1, su2=True),
], ids=["OB", "MB2"])
@pytest.mark.heavy
def test_padded_hac_su2_matches_dict(simf):
    H, psi, GL, GR = _setup(simf())
    AC = full_blocks(psi.AC(0))
    ref = full_blocks(apply_H_AC(GL, H.Ws[0], GR, AC))
    pm = PackedMPOSU2(H)
    GL3 = pm.pack_env_left(GL, 0)
    GR3 = pm.pack_env_right(GR, 1 % H.T)
    plan = PaddedHACSU2(GL3, pm.Ws[0], GR3, AC)
    out_v = plan.matvec(plan.pack_vec(AC), plan.pack_gl(GL3),
                        plan.pack_gr(GR3))
    np.testing.assert_allclose(np.asarray(out_v),
                               np.asarray(plan.pack_vec(ref)), atol=1e-11)
    # round trip through unpack keeps the blocks
    back = plan.unpack_vec(out_v, AC)
    np.testing.assert_allclose(np.asarray(plan.pack_vec(back)),
                               np.asarray(out_v), atol=0)


@pytest.mark.heavy
def test_padded_hc_su2_matches_dict():
    H, psi, GL, GR = _setup(OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True))
    g = H.site.group
    Vr = psi.ALs[0].spaces[2]
    GL1 = {a: FusionTensor.random(g, (Vr, Vr, channel_space(g, qa)),
                                  (IN, OUT, IN), seed=70 + a)
           for a, qa in enumerate(H.charges[1])}
    C = full_blocks(psi.Cs[0])
    ref = full_blocks(apply_H_C(GL1, GR, C))
    pm = PackedMPOSU2(H)
    GL13 = pm.pack_env_left(GL1, 1)
    GR3 = pm.pack_env_right(GR, 1)
    plan = PaddedHCSU2(GL13, GR3, C)
    out_v = plan.matvec(plan.pack_vec(C), plan.pack_gl(GL13),
                        plan.pack_gr(GR3))
    np.testing.assert_allclose(np.asarray(out_v),
                               np.asarray(plan.pack_vec(ref)), atol=1e-11)


@pytest.mark.slow
def test_su2_vumps_batched_equals_dict(monkeypatch):
    """Full SU(2) VUMPS trajectories agree between the bucketed batched and
    per-transition paths (same seed, same iterations)."""
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=4,
                         seed=2)
    monkeypatch.setenv("HTN_NO_SU2_PACK", "1")
    e_dict = vumps(psi, H, tol=1e-10, maxiter=3).energy
    monkeypatch.delenv("HTN_NO_SU2_PACK")
    e_packed = vumps(psi, H, tol=1e-10, maxiter=3).energy
    assert abs(e_dict - e_packed) < 1e-9


@pytest.mark.heavy
def test_packed_hac2_su2_matches_dict():
    """IDMRG2's channel-packed two-site matvec on the SU(2) backend == the
    per-path dict loop (same _PackedHAC2Plan via tensor-type dispatch)."""
    from hubbardtn_tpu.algorithms.idmrg import _DictHAC2Plan, _PackedHAC2Plan
    from hubbardtn_tpu.solvers.krylov import Packer
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H, psi, GL, _GR1 = _setup(sim)
    g = H.site.group
    Vl, Vr = psi.ALs[0].spaces[0], psi.ALs[0].spaces[2]
    # two-site block at sites (0, 1): GR channels live on bond (1+1) % T = 0
    GR = {b: FusionTensor.random(g, (Vr, Vr, channel_space(g, qb)),
                                 (IN, OUT, OUT), seed=70 + b)
          for b, qb in enumerate(H.charges[0])}
    P = H.site.space
    AC2 = FusionTensor.random(g, (Vl, P, P, Vr), (IN, OUT, OUT, OUT), seed=3)
    pk = Packer(full_blocks(AC2))
    v = pk.pack(full_blocks(AC2))
    a = _DictHAC2Plan(pk).matvec(v, GL, H.Ws[0], H.Ws[1], GR)
    pm = PackedMPOSU2(H)
    b = _PackedHAC2Plan(pk).matvec(v, pm.pack_env_left(GL, 0), pm.Ws[0],
                                   pm.Ws[1], pm.pack_env_right(GR, 0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
