"""Bucketed batched SU(2) environment refresh == the dict path, exactly."""

import numpy as np
import pytest

from hubbardtn_tpu.algorithms.environments import Environments
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import initialize_mps
from hubbardtn_tpu.solvers.krylov import full_blocks


@pytest.fixture(scope="module")
def setup():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=5,
                         seed=2)
    return H, psi


def _assert_env_dicts_match(d_envs, p_envs):
    for x in range(len(d_envs)):
        assert set(d_envs[x]) == set(p_envs[x])
        for a in d_envs[x]:
            d = full_blocks(d_envs[x][a])
            p = full_blocks(p_envs[x][a])
            assert set(d.blocks) == set(p.blocks)
            for k in d.blocks:
                np.testing.assert_allclose(
                    np.asarray(d.blocks[k]), np.asarray(p.blocks[k]),
                    atol=1e-9, err_msg=f"env[{x}][{a}] {k}")


@pytest.mark.slow
def test_su2_packed_envs_match_dict(setup, monkeypatch):
    H, psi = setup
    monkeypatch.setenv("HTN_NO_SU2_ENV_PACK", "1")
    e_dict = Environments(psi, H, tol=1e-12)
    monkeypatch.delenv("HTN_NO_SU2_ENV_PACK")
    e_pack = Environments(psi, H, tol=1e-12)
    assert abs(complex(e_dict.energy_per_site)
               - complex(e_pack.energy_per_site)) < 1e-10
    _assert_env_dicts_match(e_dict.GLs, e_pack.GLs)
    _assert_env_dicts_match(e_dict.GRs, e_pack.GRs)


@pytest.mark.heavy
def test_su2_packed_env_warm_start(setup):
    """A second refresh with prev= warm start reproduces the same fixed
    point (and exercises the x0 packing path)."""
    H, psi = setup
    envs = Environments(psi, H, tol=1e-12)
    envs2 = Environments(psi, H, tol=1e-12, prev=envs)
    assert abs(complex(envs.energy_per_site)
               - complex(envs2.energy_per_site)) < 1e-10


@pytest.mark.slow
def test_su2_batched_transfer_matches_dict_transfers(monkeypatch):
    """HTN_ENV_TRANSFER knob (SU(2)): the chained-FusionDotPlan transfers
    (algorithms/batched_transfer.SU2Transfer*) reproduce the inline dict
    transfers block-for-block."""
    import numpy as np

    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=4,
                         seed=3)
    monkeypatch.setenv("HTN_ENV_TRANSFER", "dict")
    e_d = Environments(psi, H, tol=1e-12)
    monkeypatch.setenv("HTN_ENV_TRANSFER", "batched")
    e_b = Environments(psi, H, tol=1e-12)
    assert abs(complex(e_d.energy_per_site)
               - complex(e_b.energy_per_site)) < 1e-10
    for side in ("GLs", "GRs"):
        d_envs, p_envs = getattr(e_d, side), getattr(e_b, side)
        for x in range(len(d_envs)):
            assert set(d_envs[x]) == set(p_envs[x])
            for a in d_envs[x]:
                d, p = d_envs[x][a], p_envs[x][a]
                for k in set(d.blocks) | set(p.blocks):
                    db = np.asarray(d.blocks.get(k,
                                    np.zeros(d.key_shape(k))))
                    pb = np.asarray(p.blocks.get(k,
                                    np.zeros(p.key_shape(k))))
                    np.testing.assert_allclose(
                        db, pb, atol=1e-9, err_msg=f"{side}[{x}][{a}] {k}")
