"""Mixed-precision path: f32 (chip-dtype) solve + f64 host refinement.

The TPU serves float32 only; the north star (BASELINE.json) demands
energies to 1e-8 relative.  These tests pin the bridge (algorithms/
refine.py): the variational energy error is quadratic in the state error,
so an f32-converged state refined briefly in f64 at fixed structure must
reproduce the all-f64 energy to 1e-8 relative.  The exact Lieb-Wu
integral (models/exact.py) anchors the reference's golden values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hubbardtn_tpu.algorithms.groundstate import compute_groundstate
from hubbardtn_tpu.algorithms.refine import cast_hamiltonian, cast_state
from hubbardtn_tpu.algorithms.vumps import vumps
from hubbardtn_tpu.models.exact import lieb_wu_energy
from hubbardtn_tpu.models.hubbard import OBSim


def test_lieb_wu_anchors():
    """u=0 closed form, plus: every reference golden (test/OB.jl:21-31)
    is a finite-bond value sitting variationally ABOVE the exact
    Lieb-Wu energy, within its documented 1e-2 tolerance."""
    assert abs(lieb_wu_energy(0.0) + 4.0 / np.pi) < 1e-12
    for u, golden in ((0.0, -1.2696767), (1.0, -1.037173),
                      (2.0, -0.84163698)):
        exact = lieb_wu_energy(u)
        assert golden - exact > -1e-9, "golden below exact: not variational"
        assert abs(golden - exact) < 1e-2


@pytest.mark.heavy
def test_cast_round_trip_dtypes():
    from hubbardtn_tpu.models.hubbard import hamiltonian
    from hubbardtn_tpu.mps.imps import initialize_mps
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1)
    H = hamiltonian(sim)
    H32 = cast_hamiltonian(H, jnp.float32)
    assert all(op.dtype == jnp.dtype(jnp.float32)
               for W in H32.Ws for op in W.values())
    assert all(op.dtype == jnp.dtype(jnp.float64)
               for W in H.Ws for op in W.values()), "input was mutated"
    psi = initialize_mps(H.site.group, H.site.space, sim.T, bond_dim=8,
                         seed=0)
    psi32 = cast_state(psi, jnp.float32)
    assert psi32.ALs[0].dtype == jnp.dtype(jnp.float32)
    back = cast_state(psi32, jnp.float64)
    for a, b in zip(psi.ALs, back.ALs):
        for k, blk in a.blocks.items():
            np.testing.assert_allclose(np.asarray(b.blocks[k]),
                                       np.asarray(blk), atol=1e-6)


@pytest.mark.slow
def test_f32_solve_plus_f64_refinement_hits_1e8(monkeypatch):
    """The chip workflow in miniature, on CPU: converge in f64 (truth),
    re-converge the cast-down state in f32 at the same structure (the
    chip-produced state with its ~1e-6 noise floor), then refine_f64 —
    the refined energy must land within 1e-8 RELATIVE of the f64 truth,
    and the raw f32 energy must demonstrably not."""
    monkeypatch.setenv("HTN_NO_FUSED", "1")  # tiny problem: skip the
    # multi-iteration fused program's multi-minute XLA CPU compile
    sim = OBSim(t=(1.0,), u=(2.0,), P=1, Q=1, bond_dim=8, svalue=2.0)
    out64 = compute_groundstate(sim, tol=1e-9, max_rounds=3, round_iters=30,
                                final_iters=120, algorithm="vumps",
                                grassmann_iters=10, max_bond=16)
    e64 = out64["energy"]
    H = out64["ham"]

    psi32 = cast_state(out64["groundstate"], jnp.float32)
    H32 = cast_hamiltonian(H, jnp.float32)
    res32 = vumps(psi32, H32, tol=5e-6, maxiter=40)
    rel32 = abs(res32.energy - e64) / abs(e64)

    from hubbardtn_tpu.algorithms.refine import refine_f64
    res = refine_f64(res32.psi, H, tol=1e-9, maxiter=60, grassmann_iters=10)
    rel = abs(res.energy - e64) / abs(e64)
    assert rel < 1e-8, f"refined rel err {rel:.2e}"
    assert rel < max(rel32, 1e-9), (rel, rel32)
    # sanity: the refined energy also lands on the exact Lieb-Wu side
    assert res.energy >= lieb_wu_energy(2.0) - 1e-9
