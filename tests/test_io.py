"""IO layer: serialization roundtrips, parameter extraction, packing."""

import numpy as np
import jax.numpy as jnp
import pytest

from hubbardtn_tpu.io.extract_params import extract_params
from hubbardtn_tpu.io.serialize import load_state, save_state
from hubbardtn_tpu.mps.imps import initialize_mps
from hubbardtn_tpu.ops.sites import canonical_site
from hubbardtn_tpu.solvers.krylov import Packer, TreePacker, full_blocks
from hubbardtn_tpu.tensor.symtensor import IN, OUT, SymTensor


def test_save_load_roundtrip(tmp_path):
    site = canonical_site(1, 1)
    psi = initialize_mps(site.group, site.space, 2, bond_dim=3, seed=2)
    path = str(tmp_path / "state.npz")
    save_state(psi, path)
    psi2 = load_state(path)
    assert psi2.bond_dims() == psi.bond_dims()
    for a, b in zip(psi.ALs + psi.ARs + psi.Cs, psi2.ALs + psi2.ARs + psi2.Cs):
        assert float((a - b).norm()) < 1e-14
    assert psi2.gauge_error() < 1e-8


def test_space_pickle_roundtrip():
    import pickle
    site = canonical_site(1, 3)
    sp2 = pickle.loads(pickle.dumps(site.space))
    assert sp2 == site.space           # identity-interned group survives
    assert hash(sp2) == hash(site.space)


def test_packer_roundtrips():
    site = canonical_site(1, 1)
    t = SymTensor.random(site.group, (site.space, site.space), (OUT, IN), seed=3)
    t = full_blocks(t)
    pk = Packer(t)
    t2 = pk.unpack(pk.pack(t))
    assert float((t - t2).norm()) < 1e-14
    tp = TreePacker([t, t])
    a, b = tp.unpack(tp.pack([t, t]))
    assert float((a - t).norm()) < 1e-14 and float((b - t).norm()) < 1e-14


def _synthetic_pyfoldhub(B=2, nsite=5):
    rng = np.random.default_rng(0)
    s0 = nsite // 2
    Wmn = np.zeros((nsite,) * 4 + (B,) * 4)
    tmn = rng.standard_normal((nsite, B, B))
    tmn[s0] = 0.5 * (tmn[s0] + tmn[s0].T)
    # direct terms U_ij at ranges 0, 1 and a consistent J
    for i in range(B):
        for j in range(B):
            Wmn[s0, s0, s0, s0, i, i, j, j] = 2.0 + i + j
            Wmn[s0, s0, s0 + 1, s0 + 1, i, i, j, j] = 0.3
            if i != j:
                Wmn[s0, s0, s0, s0, i, j, j, i] = 0.7   # J_OS
                Wmn[s0, s0, s0, s0, i, j, i, j] = 0.7
    return {"Wmn": Wmn, "tmn": tmn, "corr_H": np.zeros_like(tmn)}, s0


def test_extract_params_basic():
    data, s0 = _synthetic_pyfoldhub()
    t, U, J, U13_OS, U13_IS, U112, U1111 = extract_params(
        data, range_u=2, range_t=1, range_J=1)
    B = 2
    assert t.shape == (B, B)
    # chemical-potential shift: minimum on-site diagonal is zero
    assert abs(min(np.diag(t))) < 1e-14
    assert np.allclose(U[:, :B], [[2.0, 3.0], [3.0, 4.0]])
    assert np.allclose(U[:, B:], 0.3)
    assert abs(J[0, 1] - 0.7) < 1e-14 and abs(J[0, 0]) < 1e-14
    # no three/four-distinct entries in this synthetic tensor
    assert not any(abs(v) > 0 for v in U112.values())


def test_extract_params_J_inconsistency_raises():
    data, s0 = _synthetic_pyfoldhub()
    data["Wmn"][s0, s0, s0, s0, 0, 1, 0, 1] = 0.1  # break J1 == J2
    with pytest.raises(ValueError):
        extract_params(data, range_u=1, range_t=1, range_J=1)
