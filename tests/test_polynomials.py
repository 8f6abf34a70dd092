import numpy as np
import pytest

from helfem_tpu.ops.polynomials import get_basis
from helfem_tpu.ops.quadrature import chebyshev


@pytest.mark.parametrize("nnodes", [2, 5, 10, 15])
def test_lip_cardinality(nnodes):
    b = get_basis(4, nnodes)
    vals = b.eval(b.nodes, 0)[0]
    assert np.allclose(vals, np.eye(nnodes), atol=1e-13)


def test_lip_partition_of_unity():
    b = get_basis(4, 8)
    x = np.linspace(-1, 1, 101)
    v = b.eval(x, 2)
    assert np.allclose(v[0].sum(axis=1), 1.0, atol=1e-13)
    assert np.allclose(v[1].sum(axis=1), 0.0, atol=1e-11)
    assert np.allclose(v[2].sum(axis=1), 0.0, atol=1e-10)


def test_lip_derivatives_vs_fd():
    b = get_basis(4, 6)
    x = np.array([-0.63, 0.11, 0.77])
    h = 1e-6
    v = b.eval(x, 2)
    vp = b.eval(x + h, 0)[0]
    vm = b.eval(x - h, 0)[0]
    assert np.allclose((vp - vm) / (2 * h), v[1], atol=1e-7)
    assert np.allclose((vp - 2 * v[0] + vm) / h**2, v[2], atol=1e-3)


def test_lip_eval_div_exact():
    """f_i(x)/(x+1) via root removal == plain division, but stable at x->-1."""
    b = get_basis(4, 7)
    x, _ = chebyshev(20)
    g = b.eval_div(x, -1.0, 1)
    f = b.eval(x, 1)
    for i in range(1, b.nprim):  # skip the dropped i0=0 column
        assert np.allclose(g[0][:, i], f[0][:, i] / (x + 1.0), rtol=1e-12)
        # d/dx (f/(x+1)) = f'/(x+1) - f/(x+1)^2
        dref = f[1][:, i] / (x + 1) - f[0][:, i] / (x + 1) ** 2
        assert np.allclose(g[1][:, i], dref, rtol=1e-9, atol=1e-12)
