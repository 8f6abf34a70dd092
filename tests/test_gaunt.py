import numpy as np
import pytest

from helfem_tpu.ops.gaunt import gaunt_coefficient, gaunt_table, wigner3j
from helfem_tpu.ops.quadrature import gauss_lobatto
from helfem_tpu.ops.spherical import legendre_Pbar, ylm


def test_wigner3j_known():
    # (1 1 0; 0 0 0) = -1/sqrt(3); (1 1 2; 0 0 0) = sqrt(2/15)
    assert abs(wigner3j(1, 1, 0, 0, 0, 0) + 1 / np.sqrt(3)) < 1e-15
    assert abs(wigner3j(1, 1, 2, 0, 0, 0) - np.sqrt(2.0 / 15.0)) < 1e-15
    assert abs(wigner3j(2, 1, 1, 0, 1, -1) - np.sqrt(1.0 / 30.0)) < 1e-15
    assert wigner3j(1, 1, 1, 0, 0, 0) == 0.0  # odd sum parity


def test_gaunt_l0():
    # <Y_00|Y_00|Y_00> = 1/sqrt(4pi); <Y_lm|Y_00|Y_lm> = 1/sqrt(4pi)
    c = 1 / np.sqrt(4 * np.pi)
    assert abs(gaunt_coefficient(0, 0, 0, 0, 0, 0) - c) < 1e-15
    for l, m in [(1, 0), (2, 1), (3, -2)]:
        assert abs(gaunt_coefficient(l, m, 0, 0, l, m) - c) < 1e-15


@pytest.mark.parametrize("trip", [(1, 0, 1, 0, 2, 0), (2, 1, 1, -1, 3, 2), (2, -1, 2, 1, 2, 0), (3, 2, 1, 1, 4, 3)])
def test_gaunt_vs_quadrature(trip):
    """Gaunt coefficients vs direct numerical integration of Y_LM^* Y_lm Y_l'm'."""
    L, M, l, m, lp, mp = trip
    n = 40
    x, w = gauss_lobatto(n)
    phi = 2 * np.pi * np.arange(32) / 32
    wphi = 2 * np.pi / 32
    f = np.conj(ylm(L, M, x, phi)) * ylm(l, m, x, phi) * ylm(lp, mp, x, phi)
    got = np.real(np.sum(w[:, None] * f) * wphi)
    want = gaunt_coefficient(L, M, l, m, lp, mp)
    assert abs(got - want) < 1e-12


def test_gaunt_table_structure():
    lval = np.array([0, 1, 2, 3])
    mval = np.array([0, 0, 0, 0])
    G = gaunt_table(lval, mval, 6)
    # selection rules: L parity and triangle
    assert G[1, 0, 0, 0] == 0.0  # <00|10|00> parity
    assert abs(G[0, 0, 2, 2] - 1 / np.sqrt(4 * np.pi)) < 1e-15
    # symmetry in a<->b for m=0 (real)
    assert np.allclose(G, np.swapaxes(G, 2, 3))


def test_legendre_orthonormal():
    lmax = 8
    x, w = gauss_lobatto(40)
    P = legendre_Pbar(lmax, x)
    for m in range(0, 3):
        for l in range(m, lmax + 1):
            for lp in range(m, lmax + 1):
                val = 2 * np.pi * np.sum(w * P[l, m] * P[lp, m])
                assert abs(val - (1.0 if l == lp else 0.0)) < 1e-12
