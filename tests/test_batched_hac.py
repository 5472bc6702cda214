"""Channel-packed and shape-bucketed H_AC kernels vs the reference loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_hac import build_padded_hac
from hubbardtn_tpu.algorithms.vumps import apply_H_AC, apply_H_C
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mpo.channel_pack import PackedMPO
from hubbardtn_tpu.mps.imps import virtual_spaces
from hubbardtn_tpu.solvers.krylov import Packer
from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor


def _setup(sector_dim=8, sim=None):
    sim = sim or OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    g = H.site.group
    Vs = virtual_spaces(g, H.site.space, sim.T, sector_dim, cells=2)
    Vl, Vr = Vs[0], Vs[1 % len(Vs)]
    GL = {a: SymTensor.random(g, (Vl, Vl), (IN, OUT), charge=qa, seed=a)
          for a, qa in enumerate(H.charges[0])}
    GR = {b: SymTensor.random(g, (Vr, Vr), (IN, OUT), charge=g.dual(qb),
                              seed=100 + b)
          for b, qb in enumerate(H.charges[1 % H.T])}
    AC = SymTensor.random(g, (Vl, H.site.space, Vr), (IN, OUT, OUT), seed=7)
    return H, g, Vl, Vr, GL, GR, AC


def test_channel_packed_matvec_matches():
    H, g, Vl, Vr, GL, GR, AC = _setup()
    ref = apply_H_AC(GL, H.Ws[0], GR, AC)
    pm = PackedMPO(H)
    GL3 = pm.pack_env_left(GL, 0)
    GR3 = pm.pack_env_right(GR, 1)
    out = apply_H_AC({0: GL3}, {(0, 0): pm.Ws[0]}, {0: GR3}, AC)
    pk = Packer(ref)
    np.testing.assert_allclose(np.asarray(pk.pack(ref)),
                               np.asarray(pk.pack(out)), atol=1e-12)

    GL1 = {a: SymTensor.random(g, (Vr, Vr), (IN, OUT), charge=qa, seed=50 + a)
           for a, qa in enumerate(H.charges[1])}
    C = SymTensor.random(g, (Vr, Vr), (IN, OUT), seed=9)
    refc = apply_H_C(GL1, GR, C)
    outc = apply_H_C({0: pm.pack_env_left(GL1, 1)}, {0: GR3}, C)
    pkc = Packer(refc)
    np.testing.assert_allclose(np.asarray(pkc.pack(refc)),
                               np.asarray(pkc.pack(outc)), atol=1e-12)


def test_bucketed_batched_matvec_matches():
    H, g, Vl, Vr, GL, GR, AC = _setup()
    ref = apply_H_AC(GL, H.Ws[0], GR, AC)
    plan, vec, GLp, GRp = build_padded_hac(H, GL, GR, AC, 0)
    out = plan.unpack_vec(plan.matvec(vec, GLp, GRp), AC)
    pk = Packer(ref)
    np.testing.assert_allclose(np.asarray(pk.pack(ref)),
                               np.asarray(pk.pack(out)), atol=1e-12)
    # round trip of the padded vector layout
    back = plan.unpack_vec(plan.pack_vec(AC), AC)
    for k, b in AC.blocks.items():
        np.testing.assert_allclose(np.asarray(b), np.asarray(back.blocks[k]),
                                   atol=1e-14)


@pytest.mark.heavy
def test_vumps_batched_equals_dict_grand_site(monkeypatch):
    """VUMPS on the grand site must give identical trajectories on the
    batched and per-channel dict paths."""
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.models.hubbard import OBCSim
    from hubbardtn_tpu.mps.imps import initialize_mps
    sim = OBCSim(t=(1.0,), u=(2.0,), mu=1.0)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=4,
                         seed=2, cells=2)
    monkeypatch.setenv("HTN_NO_BATCHED", "1")
    e_dict = vumps(psi, H, tol=1e-12, maxiter=3).energy
    monkeypatch.delenv("HTN_NO_BATCHED")
    e_batched = vumps(psi, H, tol=1e-12, maxiter=3).energy
    assert abs(e_dict - e_batched) < 1e-9


def test_bucketed_batched_matvec_grand_site():
    """Multiplicity-carrying physical sectors (grand site, 2-dim trivial
    sector, reference :341-346) hit the same batched kernel."""
    from hubbardtn_tpu.models.hubbard import OBCSim
    sim = OBCSim(t=(1.3,), u=(2.1,), mu=0.7)
    H, g, Vl, Vr, GL, GR, AC = _setup(sector_dim=6, sim=sim)
    assert any(d > 1 for _, d in H.site.space)  # 2-dim trivial sector
    ref = apply_H_AC(GL, H.Ws[0], GR, AC)
    plan, vec, GLp, GRp = build_padded_hac(H, GL, GR, AC, 0)
    out = plan.unpack_vec(plan.matvec(vec, GLp, GRp), AC)
    pk = Packer(ref)
    np.testing.assert_allclose(np.asarray(pk.pack(ref)),
                               np.asarray(pk.pack(out)), atol=1e-12)
    back = plan.unpack_vec(plan.pack_vec(AC), AC)
    for k, b in AC.blocks.items():
        np.testing.assert_allclose(np.asarray(b), np.asarray(back.blocks[k]),
                                   atol=1e-14)


def test_packed_hac2_matches_dict():
    """IDMRG2's channel-packed two-site matvec == the per-path dict loop."""
    from hubbardtn_tpu.algorithms.idmrg import _DictHAC2Plan, _PackedHAC2Plan
    from hubbardtn_tpu.solvers.krylov import full_blocks
    H, g, Vl, Vr, GL, _GR1, AC = _setup()
    # two-site block at sites (0, 1): GR channels live on bond (1+1) % T = 0
    GR = {b: SymTensor.random(g, (Vr, Vr), (IN, OUT), charge=g.dual(qb),
                              seed=200 + b)
          for b, qb in enumerate(H.charges[0])}
    AC2 = SymTensor.random(g, (Vl, H.site.space, H.site.space, Vr),
                           (IN, OUT, OUT, OUT), seed=9)
    pk = Packer(full_blocks(AC2))
    v = pk.pack(full_blocks(AC2))
    a = _DictHAC2Plan(pk).matvec(v, GL, H.Ws[0], H.Ws[1], GR)
    pm = PackedMPO(H)
    b = _PackedHAC2Plan(pk).matvec(v, pm.pack_env_left(GL, 0), pm.Ws[0],
                                   pm.Ws[1], pm.pack_env_right(GR, 0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
