import numpy as np
import pytest

from helfem_tpu.ops.fem import FEMBasis
from helfem_tpu.ops.polynomials import get_basis
from helfem_tpu.ops.quadrature import chebyshev


def make_fem(xmin, xmax, nelem, nnodes, **kw):
    poly = get_basis(4, nnodes)
    bval = np.linspace(xmin, xmax, nelem + 1)
    return FEMBasis(poly, bval, **kw)


def test_overlap_spd_and_exact():
    fem = make_fem(0.0, 10.0, 5, 8)
    xq, wq = chebyshev(40)
    S = fem.matrix_element(0, 0, xq, wq)
    assert S.shape == (fem.nbf, fem.nbf)
    assert np.allclose(S, S.T)
    ev = np.linalg.eigvalsh(S)
    assert ev.min() > 0


def test_gather_assemble_roundtrip():
    fem = make_fem(0.0, 4.0, 4, 5)
    rng = np.random.default_rng(0)
    M = rng.standard_normal((fem.nbf, fem.nbf))
    M = M + M.T
    G = fem.gather(M)
    assert G.shape == (4, 5, 5)
    # interior entries of an element window match the global matrix
    e = 1
    ix = fem.gidx[e]
    for a in range(5):
        for b in range(5):
            if ix[a] < fem.nbf and ix[b] < fem.nbf:
                assert G[e, a, b] == M[ix[a], ix[b]]


def test_harmonic_oscillator():
    """Gate for L0-L2 (SURVEY.md build stage 2): spectrum of -1/2 d2/dx2 +
    1/2 x^2 on [-xmax, xmax] must be n + 1/2.
    (reference model problem: src/harmonic/main.cpp:17-137)"""
    poly = get_basis(4, 12)
    bval = np.linspace(-10.0, 10.0, 13)
    fem = FEMBasis(poly, bval, drop_first=True, drop_last=True)
    xq, wq = chebyshev(70)
    S = fem.matrix_element(0, 0, xq, wq)
    T = 0.5 * fem.matrix_element(1, 1, xq, wq)
    x = fem.coords(xq)
    V = 0.5 * fem.matrix_element(0, 0, xq, wq, f=x**2)
    # generalized eig via symmetric whitening
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    E = np.linalg.eigvalsh(Sinvh @ (T + V) @ Sinvh)
    exact = np.arange(12) + 0.5
    assert np.allclose(E[:12], exact, atol=1e-10), E[:12] - exact


@pytest.mark.parametrize("nelem,nnodes", [(3, 6), (6, 4)])
def test_first_derivative_matrix(nelem, nnodes):
    """<u|d/dx|v> summed against coefficient vectors reproduces integrals of
    known polynomials."""
    fem = make_fem(0.0, 2.0, nelem, nnodes, drop_first=False, drop_last=False)
    xq, wq = chebyshev(40)
    D = fem.matrix_element(0, 1, xq, wq)
    # interpolate u=x^2, v=x^3 on the FEM grid: integral x^2 * 3x^2 dx over [0,2]
    nodes_glob = np.zeros(fem.nbf)
    coef_u = np.zeros(fem.nbf)
    coef_v = np.zeros(fem.nbf)
    for e in range(fem.nelem):
        r = fem.coords(fem.poly.nodes)[e]
        for i, g in enumerate(fem.gidx[e]):
            if g < fem.nbf:
                nodes_glob[g] = r[i]
                coef_u[g] = r[i] ** 2
                coef_v[g] = r[i] ** 3
    got = coef_u @ D @ coef_v
    exact = 3.0 / 5.0 * 2.0**5
    assert abs(got - exact) < 1e-10
