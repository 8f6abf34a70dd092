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


def test_basis_families_harmonic():
    """Legendre spectral (3), HIP (5), general HIP (6, 8): harmonic spectrum."""
    from helfem_tpu.ops.fem import FEMBasis

    for pb, nn in [(3, 12), (5, 6), (6, 12), (8, 5)]:
        poly = get_basis(pb, nn)
        fem = FEMBasis(poly, np.linspace(-10.0, 10.0, 13))
        xq, wq = chebyshev(70)
        S = fem.matrix_element(0, 0, xq, wq)
        T = 0.5 * fem.matrix_element(1, 1, xq, wq)
        V = 0.5 * fem.matrix_element(0, 0, xq, wq, f=fem.coords(xq) ** 2)
        w, U = np.linalg.eigh(S)
        Sinvh = U @ np.diag(w**-0.5) @ U.T
        E = np.linalg.eigvalsh(Sinvh @ (T + V) @ Sinvh)
        assert np.abs(E[:8] - (np.arange(8) + 0.5)).max() < 1e-9, pb


def test_chebyshev_node_bases():
    """primbas 100/101: LIP/HIP at Chebyshev-Lobatto extreme points
    x_i = -cos(pi i/(n-1)) (reference: PolynomialBasis.cpp:62-82)."""
    b = get_basis(100, 9)
    assert b.nodes[0] == -1.0 and b.nodes[-1] == 1.0
    assert np.allclose(b.nodes, -np.cos(np.pi * np.arange(9) / 8), atol=1e-15)
    # cardinality + partition of unity still hold (any node set)
    assert np.allclose(b.eval(b.nodes, 0)[0], np.eye(9), atol=1e-12)
    x = np.linspace(-1, 1, 57)
    assert np.allclose(b.eval(x, 1)[0].sum(axis=1), 1.0, atol=1e-12)
    h = get_basis(101, 6)
    assert h.noverlap == 2 and h.nodes[0] == -1.0

    # full SCF: He HF limit reproduced with the Chebyshev-node LIP basis
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    ab = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=12, primbas=100)
    r = scf_atom(ab, 1, 1, convthr=1e-9)
    assert r.converged
    assert abs(r.E + 2.8616799956) < 1e-8


def test_he_hf_hip_basis():
    """Full SCF with the Hermite basis (noverlap=2 global C1 continuity)."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=8, primbas=5)
    r = scf_atom(b, 1, 1, convthr=1e-9)
    assert r.converged
    assert abs(r.E + 2.8616799956) < 1e-9
