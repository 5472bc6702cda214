"""FSM MPO compiler vs dense exact diagonalization on finite windows."""

import numpy as np
import pytest

from hubbardtn_tpu.mpo import terms as tm
from hubbardtn_tpu.mpo.fsm import mpo_from_terms
from hubbardtn_tpu.ops.fermions import Term, compile_terms
from hubbardtn_tpu.ops.sites import canonical_site, grand_site

from ed_util import compiled_dense


def window_dense_from_terms(site, T, terms, n):
    """Sum of all term placements (start + k*T) fully inside [0, n)."""
    d = site.space.total_dim
    H = np.zeros((d ** n, d ** n), dtype=np.complex128)
    for ct in compile_terms(site, terms):
        s0 = ct.start % T
        start = s0
        while start + ct.length <= n:
            shifted = type(ct)(ct.coeff, start, ct.mats, ct.fingerprints)
            H += compiled_dense(site, n, shifted)
            start += T
    return H


def check_mpo(site, T, terms, n):
    mpo = mpo_from_terms(site, T, terms)
    Hw = mpo.to_dense_window(n)
    He = window_dense_from_terms(site, T, terms, n)
    np.testing.assert_allclose(Hw, He, atol=1e-12)
    return mpo


def test_hubbard_nn_unit_cell_2():
    site = canonical_site(1, 1)
    T = 2
    terms = []
    for x in range(T):
        terms += tm.double_occupancy(x, 4.0)
        terms += tm.hopping(x, x + 1, -1.0)
    mpo = check_mpo(site, T, terms, 4)
    # NN hopping: INIT + FINAL + 4 spin/direction channels per bond
    assert mpo.max_channels() == 6


@pytest.mark.slow
def test_long_range_hopping_wraps_unit_cell():
    site = canonical_site(1, 2)
    T = 2
    terms = []
    for x in range(T):
        for r, t in enumerate([1.0, 0.5, 0.3], start=1):
            terms += tm.hopping(x, x + r, -t)
    check_mpo(site, T, terms, 6)


def test_density_density_and_exchange():
    site = canonical_site(1, 1)
    T = 2
    terms = []
    for x in range(T):
        terms += tm.double_occupancy(x, 3.0)
        terms += tm.density_density(x, x + 1, 0.8)
        terms += tm.density_density(x, x + 2, 0.2)
        terms += tm.exchange(x, x + 1, 0.5)
    check_mpo(site, T, terms, 4)


def test_correlated_hopping_and_quartics():
    site = canonical_site(1, 1)
    T = 1
    terms = []
    terms += tm.correlated_hopping(0, 1, 0.7)
    terms += tm.correlated_hopping(1, 0, 0.7)
    terms += tm.quartic_tuple((0, 1, 2, 0), 0.4)
    terms += tm.quartic_tuple((0, 2, 1, 0), 0.4)  # hermitian partner
    check_mpo(site, T, terms, 3)


def test_grand_site_mu_and_hopping():
    site = grand_site()
    T = 1
    terms = []
    terms += tm.double_occupancy(0, 7.658)
    terms += tm.number(0, -3.535)
    terms += tm.hopping(0, 1, -2.726)
    check_mpo(site, T, terms, 3)


def test_staggered_field():
    site = canonical_site(1, 1)
    T = 2
    terms = []
    for x in range(T):
        terms += tm.szop(x, 0.3 * (-1.0) ** (x + 1))
        terms += tm.hopping(x, x + 1, -1.0)
    check_mpo(site, T, terms, 4)


def test_hubbard_ed_groundstate_energy():
    """4-site open Hubbard chain: MPO window ground energy vs direct ED."""
    site = canonical_site(1, 1)
    T = 1
    u, t = 4.0, 1.0
    terms = tm.double_occupancy(0, u) + tm.hopping(0, 1, -t)
    mpo = mpo_from_terms(site, T, terms)
    H = mpo.to_dense_window(4)
    np.testing.assert_allclose(H, H.conj().T, atol=1e-12)
    w = np.linalg.eigvalsh(H)
    # independent dense construction
    He = window_dense_from_terms(site, T, terms, 4)
    we = np.linalg.eigvalsh(He)
    np.testing.assert_allclose(w, we, atol=1e-10)
