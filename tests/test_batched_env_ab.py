"""Fully-batched abelian environment refresh == the dict path, exactly."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.environments import Environments
from hubbardtn_tpu.models.hubbard import MBSim, OBCSim, OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps


def _assert_env_dicts_match(d_envs, p_envs, atol=1e-9):
    for x in range(len(d_envs)):
        assert set(d_envs[x]) == set(p_envs[x])
        for a in d_envs[x]:
            d, p = d_envs[x][a], p_envs[x][a]
            assert d.charge == p.charge
            keys = set(d.blocks) | set(p.blocks)
            for k in keys:
                db = np.asarray(d.blocks.get(k, 0.0 * np.zeros(d.key_shape(k))))
                pb = np.asarray(p.blocks.get(k, 0.0 * np.zeros(p.key_shape(k))))
                np.testing.assert_allclose(
                    db, pb, atol=atol, err_msg=f"env[{x}][{a}] {k}")


def _compare(sim, bond_dim=6, seed=3):
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T,
                         bond_dim=bond_dim, seed=seed)
    return H, psi


@pytest.mark.parametrize("sim", [
    OBSim(t=(1.0,), u=(2.0,), P=1, Q=1),                       # canonical
    OBCSim(t=(1.0,), u=(3.0,), mu=0.5),                        # grand site
    MBSim(t=[[0.5, 0.1], [0.1, 0.6]], u=[[2.0, 0.0], [0.0, 2.0]],
          J=[[0.0, 0.1], [0.1, 0.0]], P=1, Q=1),               # 2-band
], ids=["OB", "OBC-grand", "MB2"])
@pytest.mark.slow
def test_ab_packed_envs_match_dict(sim, monkeypatch):
    H, psi = _compare(sim)
    monkeypatch.setenv("HTN_NO_ENV_PACK", "1")
    e_dict = Environments(psi, H, tol=1e-12)
    monkeypatch.delenv("HTN_NO_ENV_PACK")
    e_pack = Environments(psi, H, tol=1e-12)
    assert abs(complex(e_dict.energy_per_site)
               - complex(e_pack.energy_per_site)) < 1e-10
    _assert_env_dicts_match(e_dict.GLs, e_pack.GLs)
    _assert_env_dicts_match(e_dict.GRs, e_pack.GRs)


@pytest.mark.slow
def test_engine_stacks_match_repacked_dicts():
    """The stacked arrays Environments exposes (GL_stacks/GR_stacks) equal
    the dict -> pack_env -> pack_gl repack on layout-matched plans — the
    invariant the vumps passthrough (_BatchedSite.ensure) relies on."""
    from hubbardtn_tpu.algorithms.batched_hac import PaddedHAC
    from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H, psi = _compare(sim)
    envs = Environments(psi, H, tol=1e-12)
    assert envs.ab_engine is not None and envs.GL_stacks is not None
    eng = envs.ab_engine
    T = psi.T
    for x in range(T):
        AC = psi.AC(x)
        GL3 = eng.pm.pack_env_left(envs.GLs[x], x)
        GR3 = eng.pm.pack_env_right(envs.GRs[x], (x + 1) % T)
        plan = PaddedHAC(GL3, eng.pm.Ws[x], GR3, AC,
                         Cch=eng.lay_gl[x].Cch)
        assert plan.gl.pos == eng.lay_gl[x].stacks.pos
        assert plan.gr.pos == eng.lay_gr[x].stacks.pos
        GLp = plan.pack_gl(GL3)
        GRp = plan.pack_gr(GR3)
        for ck in GLp:
            np.testing.assert_allclose(np.asarray(GLp[ck]),
                                       np.asarray(envs.GL_stacks[x][ck]),
                                       atol=1e-13)
        for ck in GRp:
            np.testing.assert_allclose(np.asarray(GRp[ck]),
                                       np.asarray(envs.GR_stacks[x][ck]),
                                       atol=1e-13)


@pytest.mark.slow
def test_vumps_passthrough_matches_dict_envs(monkeypatch):
    """Two VUMPS iterations with the engine passthrough reproduce the dict
    environments' energies."""
    from hubbardtn_tpu.algorithms.vumps import vumps

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H, psi = _compare(sim, bond_dim=5, seed=7)
    monkeypatch.setenv("HTN_NO_ENV_PACK", "1")
    r_dict = vumps(psi, H, tol=1e-12, maxiter=2)
    monkeypatch.delenv("HTN_NO_ENV_PACK")
    r_pack = vumps(psi, H, tol=1e-12, maxiter=2)
    assert abs(r_dict.energy - r_pack.energy) < 1e-8


@pytest.mark.slow
def test_ab_packed_env_warm_start():
    """A second refresh with prev= warm start reproduces the same fixed
    point (and exercises the x0 packing path)."""
    H, psi = _compare(OBSim(t=(1.0,), u=(2.0,), P=1, Q=1))
    envs = Environments(psi, H, tol=1e-12)
    envs2 = Environments(psi, H, tol=1e-12, prev=envs)
    assert abs(complex(envs.energy_per_site)
               - complex(envs2.energy_per_site)) < 1e-10


@pytest.mark.slow
def test_batched_transfer_matches_dict_transfers(monkeypatch):
    """HTN_ENV_TRANSFER knob: the class-batched presweep/fill transfers
    (algorithms/batched_transfer.py) reproduce the inline dict transfers
    block-for-block, dicts AND passthrough stacks."""
    H, psi = _compare(OBSim(t=(1.0,), u=(2.0,), P=1, Q=1))
    monkeypatch.setenv("HTN_ENV_TRANSFER", "dict")
    e_d = Environments(psi, H, tol=1e-12)
    monkeypatch.setenv("HTN_ENV_TRANSFER", "batched")
    e_b = Environments(psi, H, tol=1e-12)
    assert e_d.ab_engine.transfer_mode == "dict"
    assert e_b.ab_engine.transfer_mode == "batched"
    assert abs(complex(e_d.energy_per_site)
               - complex(e_b.energy_per_site)) < 1e-10
    _assert_env_dicts_match(e_d.GLs, e_b.GLs)
    _assert_env_dicts_match(e_d.GRs, e_b.GRs)
    for x in range(psi.T):
        for ck in e_b.GL_stacks[x]:
            np.testing.assert_allclose(np.asarray(e_d.GL_stacks[x][ck]),
                                       np.asarray(e_b.GL_stacks[x][ck]),
                                       atol=1e-9)
        for ck in e_b.GR_stacks[x]:
            np.testing.assert_allclose(np.asarray(e_d.GR_stacks[x][ck]),
                                       np.asarray(e_b.GR_stacks[x][ck]),
                                       atol=1e-9)
