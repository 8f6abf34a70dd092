"""Regularized (Gygi) nucleus: the defining property is that the node-free
regularized orbital is the EXACT ground state at E = -Z^2/2."""

import numpy as np

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.ops.gygi import gygi_V, gygi_b, gygi_phi


def test_b_normalizes_phi():
    from helfem_tpu.ops.quadrature import radial_chebyshev

    for a in (2.0, 4.0):
        b = gygi_b(a)
        r, wr = radial_chebyshev(300)
        n = 4.0 * np.pi * np.sum(wr * (r * gygi_phi(a, b, r)) ** 2)
        assert abs(n - 1.0) < 1e-10, (a, b, n)


def test_ground_state_exact():
    """One-electron atom with the regularized potential: E0 = -Z^2/2 exactly,
    for any charge and regularization width."""
    for Z, a in ((1, 2.0), (8, 3.0)):
        basis = AtomicBasis(Z=Z, lmax=0, mmax=0, rmax=30.0, nelem=10, nnodes=12)
        H = basis.kinetic() + basis.nuclear_model("regularized", a)
        S = basis.overlap()
        import scipy.linalg

        w = scipy.linalg.eigh(H, S, eigvals_only=True)
        assert abs(w[0] + 0.5 * Z * Z) < 1e-9, (Z, a, w[0])


def test_potential_coulomb_tail_and_finite_origin():
    a = 3.0
    b = gygi_b(a)
    r = np.array([1e-8, 0.1, 2.0, 5.0])
    V = gygi_V(1, a, r, b=b)
    assert np.isfinite(V).all()
    # far field: plain Coulomb
    assert abs(V[2] + 1.0 / 2.0) < 1e-10
    assert abs(V[3] + 1.0 / 5.0) < 1e-12
    # origin: finite (regularized), deeper than Coulomb is NOT required,
    # but it must be smooth: series vs analytic branch agree at 1e-4 bohr
    V1 = gygi_V(1, a, np.array([0.9999e-4 / a]), b=b)
    V2 = gygi_V(1, a, np.array([1.0001e-4 / a]), b=b)
    assert abs(V1[0] - V2[0]) < 1e-6
