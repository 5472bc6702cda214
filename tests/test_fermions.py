"""JW term compiler vs dense exact fermionic algebra (ground truth)."""

import itertools

import numpy as np
import pytest

from hubbardtn_tpu.ops.fermions import Term, compile_terms, jw_compile
from hubbardtn_tpu.ops.sites import canonical_site, grand_site

from ed_util import compiled_dense, term_dense

SITES = [canonical_site(1, 1), canonical_site(1, 2), grand_site()]
FERM = ["cu+", "cu", "cd+", "cd"]
BOSE = ["n", "docc", "sz", "nup", "ndn"]


def check_term(site, term, n=3):
    ct = jw_compile(site, term)
    dense = term_dense(site, n, term)
    if ct is None:
        np.testing.assert_allclose(dense, 0, atol=1e-12)
    else:
        np.testing.assert_allclose(compiled_dense(site, n, ct), dense, atol=1e-12)


@pytest.mark.parametrize("site", SITES)
class TestJWCompile:
    def test_site_algebra(self, site):
        """Anticommutators on the dense level sanity-check the site matrices."""
        cu = site.op("cu").to_dense()
        cud = site.op("cu+").to_dense()
        cd = site.op("cd").to_dense()
        cdd = site.op("cd+").to_dense()
        I = np.eye(4)
        np.testing.assert_allclose(cu @ cud + cud @ cu, I, atol=1e-14)
        np.testing.assert_allclose(cd @ cdd + cdd @ cd, I, atol=1e-14)
        np.testing.assert_allclose(cu @ cdd + cdd @ cu, 0 * I, atol=1e-14)
        np.testing.assert_allclose(cu @ cd + cd @ cu, 0 * I, atol=1e-14)
        np.testing.assert_allclose(site.op("n").to_dense(),
                                   cud @ cu + cdd @ cd, atol=1e-14)

    def test_hopping_pairs(self, site):
        for r in (1, 2):
            for a, b in [("cu+", "cu"), ("cd+", "cd")]:
                check_term(site, Term(1.0, ((0, a), (r, b))))
                check_term(site, Term(1.0, ((r, a), (0, b))))

    def test_density_density(self, site):
        check_term(site, Term(0.7, ((0, "n"), (2, "n"))))

    def test_all_quartics_two_site(self, site):
        """Every spin combination of c†(x1) c†(x2) c(x3) c(x4) on 2 sites."""
        for pos in itertools.product((0, 1), repeat=4):
            for s1, s2 in itertools.product("ud", repeat=2):
                ops = ((pos[0], f"c{s1}+"), (pos[1], f"c{s2}+"),
                       (pos[2], f"c{s2}"), (pos[3], f"c{s1}"))
                check_term(site, Term(1.0, ops), n=2)

    def test_quartics_three_site(self, site):
        for pos in [(0, 1, 1, 2), (0, 2, 2, 1), (2, 0, 1, 0), (1, 2, 0, 2)]:
            for s1, s2 in itertools.product("ud", repeat=2):
                ops = ((pos[0], f"c{s1}+"), (pos[1], f"c{s2}+"),
                       (pos[2], f"c{s2}"), (pos[3], f"c{s1}"))
                check_term(site, Term(0.3, ops), n=3)

    def test_random_products(self, site):
        rng = np.random.default_rng(0)
        names = FERM + BOSE
        count = 0
        while count < 60:
            m = rng.integers(1, 6)
            ops = tuple((int(rng.integers(0, 3)), names[rng.integers(0, len(names))])
                        for _ in range(m))
            parity = sum(site.parity(n) for _, n in ops) % 2
            if parity:
                continue
            check_term(site, Term(1.0, ops))
            count += 1

    def test_odd_parity_rejected(self, site):
        with pytest.raises(ValueError):
            jw_compile(site, Term(1.0, ((0, "cu+"),)))


def test_merge_cancellation():
    site = canonical_site(1, 1)
    t1 = Term(1.0, ((0, "cu+"), (1, "cu")))
    t2 = Term(-1.0, ((0, "cu+"), (1, "cu")))
    assert compile_terms(site, [t1, t2]) == []
    merged = compile_terms(site, [t1, Term(2.0, ((0, "cu+"), (1, "cu")))])
    # JW sign folding may flip the stored coefficient's sign; magnitude is 3
    assert len(merged) == 1 and abs(abs(merged[0].coeff) - 3.0) < 1e-14
