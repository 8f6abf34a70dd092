import numpy as np
import pytest

from helfem_tpu.ops.quadrature import chebyshev, gauss_lobatto, radial_chebyshev


@pytest.mark.parametrize("n", [2, 3, 5, 10, 15, 20, 31])
def test_lobatto_polynomial_exactness(n):
    """n-point Lobatto is exact for degree <= 2n-3."""
    x, w = gauss_lobatto(n)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    for deg in range(0, 2 * n - 2):
        exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
        got = np.sum(w * x**deg)
        assert abs(got - exact) < 5e-15 * max(1, n), (n, deg)


def test_lobatto_known_values():
    # n=4: interior nodes +-1/sqrt(5), weights 1/6, 5/6
    x, w = gauss_lobatto(4)
    assert np.allclose(x, [-1, -1 / np.sqrt(5), 1 / np.sqrt(5), 1], atol=1e-15)
    assert np.allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-15)


@pytest.mark.parametrize("n", [10, 40, 80, 200])
def test_chebyshev_integrates(n):
    """Modified Gauss-Chebyshev integrates smooth functions on [-1,1]."""
    x, w = chebyshev(n)
    assert np.all(np.diff(x) > 0)
    assert np.all((x > -1) & (x < 1))
    got = np.sum(w * np.exp(x))
    exact = np.exp(1) - np.exp(-1)
    assert abs(got - exact) < 1e-11 if n >= 40 else 1e-6


def test_chebyshev_polynomials_highorder():
    x, w = chebyshev(200)
    for deg in range(0, 12):
        exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
        assert abs(np.sum(w * x**deg) - exact) < 1e-12


def test_radial_chebyshev():
    """Radial rule integrates r^2 exp(-r) over [0, inf) = 2."""
    r, w = radial_chebyshev(400)
    got = np.sum(w * r**2 * np.exp(-r))
    assert abs(got - 2.0) < 1e-10
