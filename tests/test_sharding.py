"""Multi-chip sharding as a tested property (8-device CPU mesh).

The conftest forces ``--xla_force_host_platform_device_count=8``, so every
test here runs real SPMD partitioning: the bucketed batched H_AC stacks and
the per-channel environment dicts are sharded over a ``Mesh``, XLA inserts
the collectives, and results must match the unsharded programs to float64
round-off.  This is the single-program analog of the pod-slice deployment
path (SURVEY.md section 2C: shard the block-batched contractions over ICI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_hac import build_padded_hac
from hubbardtn_tpu.algorithms.environments import mpo_transfer_left
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.parallel.sharding import (make_mesh, n_sharded_leaves,
                                             shard_stacks, shard_tree)
from hubbardtn_tpu.solvers.krylov import lanczos_ground_plan

from test_batched_hac import _setup


def test_mesh_devices_available():
    assert len(jax.devices()) >= 8


@pytest.fixture(scope="module")
def problem():
    H, g, Vl, Vr, GL, GR, AC = _setup(sector_dim=16)
    plan, vec, GLp, GRp = build_padded_hac(H, GL, GR, AC, 0)
    return H, g, GL, GR, AC, plan, vec, GLp, GRp


def test_sharded_batched_matvec_matches(problem):
    """Batched H_AC with sharded stacks == unsharded, and the sharding is
    not vacuous (most stack leaves actually split)."""
    H, g, GL, GR, AC, plan, vec, GLp, GRp = problem
    mv = jax.jit(plan.matvec)
    ref = np.asarray(mv(vec, GLp, GRp))

    mesh = make_mesh(8)
    GLs = shard_stacks(mesh, GLp)
    GRs = shard_stacks(mesh, GRp)
    split, total = n_sharded_leaves((GLs, GRs))
    assert split >= total // 2, f"only {split}/{total} stack leaves sharded"
    out = np.asarray(mv(vec, GLs, GRs))
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_sharded_lanczos_restart_matches(problem):
    """A full jitted Lanczos restart over sharded operands reproduces the
    unsharded Ritz value."""
    H, g, GL, GR, AC, plan, vec, GLp, GRp = problem
    t_ref, v_ref, _ = lanczos_ground_plan(plan, (GLp, GRp), vec,
                                          krylov_dim=12, tol=1e-12,
                                          max_restarts=3)
    mesh = make_mesh(8)
    GLs = shard_stacks(mesh, GLp)
    GRs = shard_stacks(mesh, GRp)
    t_sh, v_sh, _ = lanczos_ground_plan(plan, (GLs, GRs), vec,
                                        krylov_dim=12, tol=1e-12,
                                        max_restarts=3)
    assert abs(t_ref - t_sh) < 1e-10
    overlap = abs(complex(jnp.vdot(v_ref, v_sh)))
    assert abs(overlap - 1.0) < 1e-9


@pytest.mark.heavy
def test_sharded_env_transfer_matches(problem):
    """Per-channel MPO environment transfer with sharded SymTensor blocks
    == unsharded (the environment-refresh path)."""
    H, g, GL, GR, AC, plan, vec, GLp, GRp = problem
    from hubbardtn_tpu.mps.imps import initialize_mps
    psi = initialize_mps(g, H.site.space, H.T, bond_dim=16, seed=5, cells=2)
    AL = psi.ALs[0]
    # align environment bond structure with AL's left bond
    Vl = AL.spaces[0]
    from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor
    GL0 = {a: SymTensor.random(g, (Vl, Vl), (IN, OUT), charge=qa, seed=a)
           for a, qa in enumerate(H.charges[0])}

    step = jax.jit(lambda env, A: mpo_transfer_left(env, H.Ws[0], A, A))
    ref = step(GL0, AL)
    mesh = make_mesh(8)
    GL0_sh = {a: shard_tree(mesh, t) for a, t in GL0.items()}
    AL_sh = shard_tree(mesh, AL)
    split, total = n_sharded_leaves((GL0_sh, AL_sh))
    assert split > 0
    out = step(GL0_sh, AL_sh)
    for b in ref:
        for k, blk in ref[b].blocks.items():
            np.testing.assert_allclose(np.asarray(out[b].blocks[k]),
                                       np.asarray(blk), atol=1e-11)


@pytest.mark.heavy
def test_sharded_momentum_lanes_match():
    """The momentum-batched excitation H_eff with its lane axis sharded
    over the mesh == unsharded: scan lanes are independent, so the batch
    axis is a collective-free data-parallel axis (a K-point dispersion
    scan scales linearly over chips)."""
    from hubbardtn_tpu.algorithms.excitations import (
        QuasiparticleProblem, apply_heff_packed_batched)
    from hubbardtn_tpu.algorithms.vumps import vumps
    from hubbardtn_tpu.mps.imps import initialize_mps
    from hubbardtn_tpu.parallel.sharding import shard_lanes

    sim = OBSim(t=(1.0,), u=(4.0,), P=2, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=3,
                         seed=1, cells=2)
    res = vumps(psi, H, tol=1e-10, maxiter=60)
    prob = QuasiparticleProblem(res.psi, H, res.envs, (1, 1, -1))
    K = 8
    ph = jnp.asarray(np.exp(1j * np.linspace(0.2, np.pi, K)),
                     dtype=jnp.complex128)
    rng = np.random.default_rng(3)
    Vb = jnp.asarray(rng.standard_normal((K, prob.packer.total))
                     + 1j * rng.standard_normal((K, prob.packer.total)))
    ref = np.asarray(apply_heff_packed_batched(prob, Vb, ph, False))

    mesh = make_mesh(8)
    Vb_sh = shard_lanes(mesh, Vb)
    ph_sh = shard_lanes(mesh, ph)
    assert not Vb_sh.sharding.is_fully_replicated
    out = np.asarray(apply_heff_packed_batched(prob, Vb_sh, ph_sh, False))
    np.testing.assert_allclose(out, ref, atol=1e-10)


@pytest.mark.heavy
def test_sharded_su2_batched_matvec_matches():
    """The SU(2) bucketed fusion H_AC with sharded stacks == unsharded:
    the stack layout (class key -> (n, ...) array) is backend-agnostic, so
    the same batch-axis/bucket-axis placement serves the fusion kernels."""
    from hubbardtn_tpu.algorithms.batched_fusion import PaddedHACSU2
    from hubbardtn_tpu.mpo.su2_pack import PackedMPOSU2
    from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
    from hubbardtn_tpu.mps.imps import initialize_mps
    from hubbardtn_tpu.ops.sites_su2 import channel_space
    from hubbardtn_tpu.solvers.krylov import full_blocks
    from hubbardtn_tpu.tensor.fusion import FusionTensor
    from hubbardtn_tpu.tensor.symtensor import IN, OUT

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=16,
                         seed=1)
    g = H.site.group
    Vl, Vr = psi.ALs[0].spaces[0], psi.ALs[0].spaces[2]
    GL = {a: FusionTensor.random(g, (Vl, Vl, channel_space(g, qa)),
                                 (IN, OUT, IN), seed=a)
          for a, qa in enumerate(H.charges[0])}
    GR = {b: FusionTensor.random(g, (Vr, Vr, channel_space(g, qb)),
                                 (IN, OUT, OUT), seed=50 + b)
          for b, qb in enumerate(H.charges[1])}
    AC = full_blocks(psi.AC(0))
    pm = PackedMPOSU2(H)
    GL3 = pm.pack_env_left(GL, 0)
    GR3 = pm.pack_env_right(GR, 1)
    plan = PaddedHACSU2(GL3, pm.Ws[0], GR3, AC)
    vec = plan.pack_vec(AC)
    GLp, GRp = plan.pack_gl(GL3), plan.pack_gr(GR3)
    mv = jax.jit(plan.matvec)
    ref = np.asarray(mv(vec, GLp, GRp))

    mesh = make_mesh(8)
    GLs = shard_stacks(mesh, GLp)
    GRs = shard_stacks(mesh, GRp)
    split, total = n_sharded_leaves((GLs, GRs))
    assert split > 0, "no SU(2) stack leaf was sharded"
    out = np.asarray(mv(vec, GLs, GRs))
    np.testing.assert_allclose(out, ref, atol=1e-11)


@pytest.mark.slow
def test_sharded_fused_su2_iteration_matches():
    """SU(2) mirror of test_sharded_fused_iteration_matches: the
    production whole-iteration fused program of the fusion-tree backend
    (FusedIterPlanSU2.step — the single dispatch the TPU driver runs per
    iteration under the reference's default symmetry) executes with its
    carry sharded over the mesh and reproduces the unsharded energy and
    gauge error."""
    from hubbardtn_tpu.algorithms.batched_env_su2 import SU2EnvEngine
    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.algorithms.fused_vumps_su2 import FusedIterPlanSU2
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, su2=True)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=12,
                         seed=2)
    envs = Environments(psi, H, tol=1e-10)
    eng = SU2EnvEngine.get(psi, H)
    assert hasattr(eng, "raw"), "SU(2) batched env engine must serve this"
    # small Krylov/GMRES programs: the equality property is shape- and
    # schedule-independent, and the two fused-step compiles dominate
    plan = FusedIterPlanSU2(psi, H, eng, envs, krylov_dim=6,
                            max_restarts=2, gmres_dim=10)
    ACs, Cs, EL, ER, yL, yR = plan.init_carry(psi, envs)
    ref = plan.step(ACs, Cs, EL, ER, yL, yR, np.inf, 1e-6)
    e_ref, err_ref = float(np.real(ref[8])), float(ref[9])

    mesh = make_mesh(8)
    ACs_sh = [shard_tree(mesh, t) for t in ACs]
    Cs_sh = [shard_tree(mesh, t) for t in Cs]
    EL_sh = [tuple(shard_stacks(mesh, p) for p in pair) for pair in EL]
    ER_sh = [tuple(shard_stacks(mesh, p) for p in pair) for pair in ER]
    split, total = n_sharded_leaves((EL_sh, ER_sh))
    assert split > 0, "no SU(2) env stack leaf was sharded"
    out = plan.step(ACs_sh, Cs_sh, EL_sh, ER_sh, yL, yR, np.inf, 1e-6)
    assert abs(float(np.real(out[8])) - e_ref) < 1e-9
    assert abs(float(out[9]) - err_ref) < 1e-9
    np.testing.assert_allclose(np.asarray(out[6]), np.asarray(ref[6]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out[7]), np.asarray(ref[7]),
                               atol=1e-8)


@pytest.mark.slow
def test_sharded_fused_iteration_matches():
    """The PRODUCTION whole-iteration fused program (FusedIterPlan.step —
    the single dispatch the TPU driver runs per iteration) executes with
    its entire carry sharded over the mesh and reproduces the unsharded
    energy/gauge error: the multichip path is the same program the
    single-chip driver dispatches, with XLA's SPMD partitioner inserting
    the collectives inside the lax.while_loop solver bodies."""
    from hubbardtn_tpu.algorithms.environments import Environments
    from hubbardtn_tpu.algorithms.fused_vumps import FusedIterPlan
    from hubbardtn_tpu.mps.imps import initialize_mps

    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=16,
                         seed=2)
    envs = Environments(psi, H, tol=1e-10)
    assert envs.ab_engine is not None, "batched engine must serve this"
    # small Krylov/GMRES programs: the equality property is shape- and
    # schedule-independent, and the two fused-step compiles dominate the
    # test's wall time
    plan = FusedIterPlan(psi, H, envs.ab_engine, krylov_dim=6,
                         max_restarts=2, gmres_dim=10)
    ACs, Cs, GLstk, GRstk, yL, yR = plan.init_carry(psi, envs)
    ref = plan.step(ACs, Cs, GLstk, GRstk, yL, yR, np.inf, 1e-6)
    e_ref, err_ref = float(np.real(ref[8])), float(ref[9])

    mesh = make_mesh(8)
    ACs_sh = [shard_tree(mesh, t) for t in ACs]
    Cs_sh = [shard_tree(mesh, t) for t in Cs]
    GLstk_sh = [shard_stacks(mesh, d) for d in GLstk]
    GRstk_sh = [shard_stacks(mesh, d) for d in GRstk]
    split, total = n_sharded_leaves((GLstk_sh, GRstk_sh))
    assert split > 0, "no env stack leaf was sharded"
    out = plan.step(ACs_sh, Cs_sh, GLstk_sh, GRstk_sh, yL, yR, np.inf, 1e-6)
    assert abs(float(np.real(out[8])) - e_ref) < 1e-9
    assert abs(float(out[9]) - err_ref) < 1e-9
    # the refreshed env solutions agree leaf-for-leaf (reduction-order
    # differences only; 1e-8 leaves headroom for a one-restart divergence
    # between the sharded and unsharded device while_loops — the scalar
    # energy/err asserts above pin the meaningful equality)
    np.testing.assert_allclose(np.asarray(out[6]), np.asarray(ref[6]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out[7]), np.asarray(ref[7]),
                               atol=1e-8)
