"""Bucketed Newton-Schulz polar gauge vs exact QR-based gauge.

At a CONSISTENT gauge point (AC = AL C = C' AR with isometric AL/AR and a
well-conditioned C) the polar factors satisfy U(AL C) = AL U(C), so the
polar gauge must reproduce AL and AR exactly; the gauge errors must vanish.
This pins the bucketed NS iteration, the pad-exactness, and the transposed
right-isometry path in float64.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.algorithms.batched_gauge import (PolarGaugePlan,
                                                    gauge_site_polar)
from hubbardtn_tpu.models.hubbard import OBSim, hamiltonian
from hubbardtn_tpu.mps.imps import (absorb_bond_left, absorb_bond_right,
                                    initialize_mps)
from hubbardtn_tpu.tensor.symtensor import tensordot


def _consistent_point():
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=10,
                         seed=3, cells=2)
    x = 0
    AL, AR = psi.ALs[x], psi.ARs[x]
    Cl, Cr = psi.Cs[(x - 1) % psi.T], psi.Cs[x]
    AC = absorb_bond_right(AL, Cr)
    return AC, Cl, Cr, AL, AR


@pytest.mark.heavy
def test_polar_gauge_recovers_isometries():
    AC, Cl, Cr, AL, AR = _consistent_point()
    plan = PolarGaugePlan(AC, Cl, Cr, iters=40)
    AL2, AR2, dl, dr = gauge_site_polar(AC, Cl, Cr, plan=plan)
    assert float((AL2 - AL).norm()) < 1e-8
    assert float(dl) < 1e-9
    # the AR side closes through AC = Cl AR
    assert float((absorb_bond_left(Cl, AR2) - AC).norm()) < 1e-8
    assert float(dr) < 1e-8
    # isometry conditions
    gl = tensordot(AL2.conj(), AL2, axes=([0, 1], [0, 1]))
    from hubbardtn_tpu.mps.imps import bond_identity
    I = bond_identity(AL2.group, AL2.spaces[2], dtype=AL2.dtype)
    assert float((gl - I).norm()) < 1e-9
    gr = tensordot(AR2, AR2.conj(), axes=([1, 2], [1, 2]))
    Il = bond_identity(AR2.group, AR2.spaces[0], dtype=AR2.dtype)
    assert float((gr - Il).norm()) < 1e-9


def test_quintic_schedule_beats_pure_ns_on_tiny_singular_values():
    """The default (10, 6) quintic+polish schedule must orthogonalize a
    stack with singular values down to 1e-5 where 26 plain NS steps (the
    old default, 52 matmuls vs 42) still leave the smallest direction
    visibly short of 1."""
    from hubbardtn_tpu.algorithms.batched_gauge import _ns_polar_stack
    rng = np.random.default_rng(7)
    n, R, C = 3, 24, 12
    svals = np.geomspace(1e-5, 1.0, C)
    Xs = []
    for k in range(n):
        U, _ = np.linalg.qr(rng.standard_normal((R, C)))
        V, _ = np.linalg.qr(rng.standard_normal((C, C)))
        Xs.append(U @ np.diag(svals) @ V.T)
    X = jnp.asarray(np.stack(Xs))
    Uq = np.asarray(_ns_polar_stack(X, iters=(10, 6)))
    Un = np.asarray(_ns_polar_stack(X, iters=26))
    I = np.eye(C)
    err_q = max(np.linalg.norm(u.T.conj() @ u - I) for u in Uq)
    err_n = max(np.linalg.norm(u.T.conj() @ u - I) for u in Un)
    assert err_q < 1e-5
    assert err_q < err_n
    # same polar factor as SVD-based exact polar, directionwise
    for x, u in zip(Xs, Uq):
        W, _, Vh = np.linalg.svd(x, full_matrices=False)
        assert np.linalg.norm(u - W @ Vh) < 1e-4


def test_quintic_legacy_int_schedule_is_pure_ns():
    """A bare int `iters` must keep the legacy pure-NS semantics used by
    the f64 QR-parity tests above."""
    from hubbardtn_tpu.algorithms.batched_gauge import _norm_schedule
    assert _norm_schedule(26) == (0, 26)
    assert _norm_schedule((10, 6)) == (10, 6)


@pytest.mark.heavy
def test_polar_gauge_matches_qr_errors_random():
    """On a random (inconsistent) AC the polar and QR gauges differ, but
    both must produce exact isometries and comparable gauge errors."""
    from hubbardtn_tpu.algorithms.vumps import _gauge_site
    from hubbardtn_tpu.solvers.krylov import full_blocks
    from hubbardtn_tpu.tensor.symtensor import SymTensor
    AC, Cl, Cr, AL, AR = _consistent_point()
    rng_t = SymTensor.random(AC.group, AC.spaces, AC.arrows, seed=11)
    AC2 = full_blocks(AC + 0.3 * rng_t)
    plan = PolarGaugePlan(AC2, Cl, Cr, iters=40)
    ALp, ARp, dlp, drp = gauge_site_polar(AC2, Cl, Cr, plan=plan)
    ALq, ARq, dlq, drq = _gauge_site(AC2, Cl, Cr)
    gl = tensordot(ALp.conj(), ALp, axes=([0, 1], [0, 1]))
    from hubbardtn_tpu.mps.imps import bond_identity
    I = bond_identity(ALp.group, ALp.spaces[2], dtype=ALp.dtype)
    assert float((gl - I).norm()) < 1e-7
    # same ballpark of gauge error as the QR route (within 2x)
    assert float(dlp) < 2 * float(dlq) + 1e-8
    assert float(drp) < 2 * float(drq) + 1e-8


def test_express_schedule_fewer_matmuls_and_more_accurate():
    """The default per-step minimax ("polar express") schedule must not
    cost more matmuls than the fixed (10, 6) schedule while orthogonalizing
    a DEEPER spectrum (floor 1e-7 vs 1e-6) to near machine precision
    (3e-11 vs the fixed schedule's 1e-3); pads (s = 0) stay zero."""
    from hubbardtn_tpu.algorithms.batched_gauge import (_norm_schedule,
                                                        _ns_polar_stack)
    sched = _norm_schedule("express")
    assert sched[0] == "express"
    n_mm = 3 * len(sched[1])
    assert n_mm <= 10 * 3 + 6 * 2  # at most the (10, 6) cost
    # composed scalar map: every s in [1e-7, 1] lands within 1e-8 of 1
    xs = np.geomspace(1e-7, 1.0, 5001)
    ys = xs.copy()
    for a, b, c in sched[1]:
        ys = a * ys + b * ys ** 3 + c * ys ** 5
    assert np.max(np.abs(ys - 1.0)) < 1e-8

    rng = np.random.default_rng(7)
    n, R, C = 3, 24, 12
    svals = np.geomspace(1e-6, 1.0, C)
    Xs = []
    for _ in range(n):
        U, _ = np.linalg.qr(rng.standard_normal((R, C)))
        V, _ = np.linalg.qr(rng.standard_normal((C, C)))
        Xs.append(U @ np.diag(svals) @ V.T)
    X = jnp.asarray(np.stack(Xs))
    # pad the stack: extra zero rows/cols must stay exactly zero
    Xp = jnp.zeros((n, R + 4, C + 4), X.dtype).at[:, :R, :C].set(X)
    Ue = np.asarray(_ns_polar_stack(Xp, iters="express"))
    assert np.max(np.abs(Ue[:, R:, :])) == 0.0
    assert np.max(np.abs(Ue[:, :, C:])) == 0.0
    Uq = np.asarray(_ns_polar_stack(X, iters=(10, 6)))
    I = np.eye(C)
    err_e = max(np.linalg.norm(u.T.conj() @ u - I) for u in Ue[:, :R, :C])
    err_q = max(np.linalg.norm(u.T.conj() @ u - I) for u in Uq)
    assert err_e < err_q
    assert err_e < 1e-9
    for x, u in zip(Xs, Ue[:, :R, :C]):
        W, _, Vh = np.linalg.svd(x, full_matrices=False)
        assert np.linalg.norm(u - W @ Vh) < 1e-8


@pytest.mark.heavy
def test_batched_assembly_matches_dict_path():
    """The class-batched AL/AR assembly + stack-domain gauge errors
    (PolarGaugePlan._apply_batched, the production path) are block-exact
    against the per-sector dict assembly (_apply_dict)."""
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=12,
                         seed=5, cells=2)
    from hubbardtn_tpu.solvers.krylov import full_blocks
    for x in range(psi.T):
        AC = full_blocks(psi.AC(x))
        Cl, Cr = psi.Cs[(x - 1) % psi.T], psi.Cs[x]
        plan = PolarGaugePlan(AC, Cl, Cr)
        if any(plan.meta[s].fallback for s in plan.SIDES):
            continue  # wide transient: batched path not taken
        ALd, ARd, dld, drd = plan._apply_dict(AC, Cl, Cr)
        ALb, ARb, dlb, drb = plan._apply_batched(AC, Cl, Cr)
        assert set(ALd.blocks) == set(ALb.blocks)
        for k in ALd.blocks:
            np.testing.assert_allclose(np.asarray(ALb.blocks[k]),
                                       np.asarray(ALd.blocks[k]), atol=1e-11)
        for k in ARd.blocks:
            np.testing.assert_allclose(np.asarray(ARb.blocks[k]),
                                       np.asarray(ARd.blocks[k]), atol=1e-11)
        assert abs(float(dld) - float(dlb)) < 1e-10
        assert abs(float(drd) - float(drb)) < 1e-10
