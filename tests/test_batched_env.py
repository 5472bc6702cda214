"""Bucketed batched environment transfer vs the per-block dict path."""

import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_env import (RegLeftPackedPlan,
                                                  RegRightPackedPlan)
from hubbardtn_tpu.algorithms.environments import (_RegLeftPlan,
                                                   _RegRightPlan, pair_envs,
                                                   rho_left, rho_right)
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import bond_identity, initialize_mps
from hubbardtn_tpu.solvers.krylov import Packer, full_blocks
from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor


def _state():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=7,
                         seed=4, cells=2)
    return H, psi


@pytest.mark.heavy
def test_packed_reg_left_matches_dict():
    H, psi = _state()
    g = psi.group
    V = psi.ALs[0].spaces[0]
    I0 = bond_identity(g, V)
    rho = rho_right(psi.Cs[psi.T - 1])
    tr = pair_envs(I0, rho)
    X = full_blocks(SymTensor.random(g, (V, V), (IN, OUT), seed=3))

    pk = Packer(X)
    ref = pk.unpack(_RegLeftPlan(pk).matvec(pk.pack(X), tuple(psi.ALs),
                                            rho, I0, tr))

    plan = RegLeftPackedPlan(psi)
    ops = (plan.pack_As(psi), plan.layout.pack_transposed(rho),
           plan.layout.pack(I0), tr)
    out = plan.layout.unpack(plan.matvec(plan.layout.pack(X), *ops), X)
    for k, b in ref.blocks.items():
        np.testing.assert_allclose(np.asarray(out.blocks[k]), np.asarray(b),
                                   atol=1e-12)


@pytest.mark.heavy
def test_packed_reg_right_matches_dict():
    H, psi = _state()
    g = psi.group
    V = psi.ARs[psi.T - 1].spaces[2]
    I0 = bond_identity(g, V)
    sig = rho_left(psi.Cs[psi.T - 1])
    tr = pair_envs(sig, I0)
    X = full_blocks(SymTensor.random(g, (V, V), (IN, OUT), seed=5))

    pk = Packer(X)
    ref = pk.unpack(_RegRightPlan(pk).matvec(pk.pack(X), tuple(psi.ARs),
                                             sig, I0, tr))

    plan = RegRightPackedPlan(psi)
    ops = (plan.pack_As(psi), plan.layout.pack_transposed(sig),
           plan.layout.pack(I0), tr)
    out = plan.layout.unpack(plan.matvec(plan.layout.pack(X), *ops), X)
    for k, b in ref.blocks.items():
        np.testing.assert_allclose(np.asarray(out.blocks[k]), np.asarray(b),
                                   atol=1e-12)


@pytest.mark.slow
def test_environments_energy_unchanged():
    """End to end: Environments with the packed GMRES reproduces the
    energy of a converged small state (free fermions, golden -4/pi area)."""
    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.algorithms.vumps import vumps
    H, psi = _state()
    res = vumps(psi, H, tol=1e-6, maxiter=40)
    envs = Environments(res.psi, H, tol=1e-12)
    e = float(jnp.real(envs.energy_per_site))
    assert abs(e - res.energy) < 1e-8
