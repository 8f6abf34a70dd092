import numpy as np
import pytest

from helfem_tpu.ops.fem import FEMBasis
from helfem_tpu.ops.grids import get_grid
from helfem_tpu.ops.polynomials import get_basis
from helfem_tpu.ops.radial import RadialBasis


def make_radial(Z=1, nelem=10, nnodes=15, rmax=40.0, nquad=None, zexp=2.0):
    poly = get_basis(4, nnodes)
    bval = get_grid(rmax, nelem, igrid=4, zexp=zexp)
    fem = FEMBasis(poly, bval)
    return RadialBasis(fem, nquad or 5 * nnodes)


def hydrogenic_levels(rb, Z, l):
    S = rb.overlap()
    H = rb.kinetic() + l * (l + 1) * rb.kinetic_l() + Z * rb.nuclear()
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    return np.linalg.eigvalsh(Sinvh @ H @ Sinvh)


@pytest.mark.parametrize("Z,l", [(1, 0), (1, 1), (8, 0), (8, 2)])
def test_hydrogenic_spectrum(Z, l):
    """Gate for L3 (SURVEY.md stage 3): eigenvalues -Z^2/2n^2 to 1e-10.

    Rmax=60/sqrt(Z) keeps the Dirichlet-wall truncation of the n=3..4 states
    below the tolerance (the residual is box physics, not discretization)."""
    rb = make_radial(rmax=60.0 / np.sqrt(Z))
    E = hydrogenic_levels(rb, Z, l)
    for k in range(3 - l):
        n = l + 1 + k
        exact = -Z * Z / (2.0 * n * n)
        assert abs(E[k] - exact) < 2e-10 * Z * Z, (n, E[k], exact)


def test_overlap_vs_moments():
    """radial_integral(0) must equal overlap (b*b*r^2 == B*B)."""
    rb = make_radial(nelem=5, nnodes=8, rmax=20.0)
    assert np.allclose(rb.radial_integral(0), rb.overlap(), atol=1e-12)


def test_hydrogen_1s_moments():
    """<r> = 1.5, <r^2> = 3, <1/r> = 1 for hydrogen 1s."""
    rb = make_radial()
    S = rb.overlap()
    H = rb.kinetic() + rb.nuclear()
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    E, V = np.linalg.eigh(Sinvh @ H @ Sinvh)
    c = Sinvh @ V[:, 0]
    for n, exact in [(1, 1.5), (2, 3.0), (-1, 1.0)]:
        got = c @ rb.radial_integral(n) @ c
        assert abs(got - exact) < 1e-9, (n, got)


def test_nuclear_values():
    """Hydrogen 1s: psi(0) = 1/sqrt(pi), via b_i(0) = B_i'(0)."""
    rb = make_radial()
    S = rb.overlap()
    H = rb.kinetic() + rb.nuclear()
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    E, V = np.linalg.eigh(Sinvh @ H @ Sinvh)
    c = Sinvh @ V[:, 0]
    b0 = rb.bf_at_origin()
    # radial part R(0) = sum_i c_i b_i(0); psi = R*Y00 -> rho(0) = (R(0)Y00)^2
    R0 = abs(c @ b0)
    assert abs(R0 - 2.0) < 1e-8  # R_1s(0) = 2 for Z=1


def test_disjoint_zero_element_sanitized():
    rb = make_radial(nelem=4, nnodes=6, rmax=10.0)
    dL, dm = rb.disjoint_integrals(4)
    assert np.all(dm[:, 0] == 0.0)
    assert np.all(np.isfinite(dL))
    assert np.all(np.isfinite(dm))
