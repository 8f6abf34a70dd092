"""GTO/STO completeness and importance profiles (reference: src/general/
lcao.cpp; sadatom completeness/importance exports in src/sadatom/solver.cpp)."""

import numpy as np

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.ops.lcao import (
    completeness_profile,
    importance_profile,
    radial_GTO,
    radial_STO,
)
from helfem_tpu.scf.atomic_scf import scf_atom


def _quad(rb):
    """Flattened (r, w r^2) quadrature over all elements."""
    r = np.asarray(rb.r).reshape(-1)
    w = np.asarray(rb.wr * rb.r**2).reshape(-1)
    return r, w


def test_normalizations():
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=60.0, nelem=14, nnodes=14)
    r, w = _quad(b.rb)
    for l in (0, 1, 2, 3):
        g = radial_GTO(r, l, np.array([0.3, 1.0, 4.7]))
        s = radial_STO(r, l, np.array([0.7, 1.3, 3.0]))
        np.testing.assert_allclose(w @ g**2, 1.0, atol=1e-10)
        np.testing.assert_allclose(w @ s**2, 1.0, atol=1e-10)


def test_completeness_profile_saturates():
    """A converged FEM basis spans any reasonable GTO/STO: Y(alpha) -> 1."""
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    # STO with zeta=0.1 leaks past rmax=40 (e^{-4} tail) -- physics, so the
    # diffuse end starts at zeta=0.5 for STOs.
    for kind, lo in (("GTO", -1.0), ("STO", np.log10(0.5))):
        expn = 10.0 ** np.linspace(lo, 2.0, 7)
        Y = completeness_profile(b.rb, 0, expn, kind=kind)
        assert np.all(Y > 1.0 - 1e-8), (kind, Y)
        assert np.all(Y < 1.0 + 1e-8), (kind, Y)


def test_importance_hydrogen_1s():
    """H 1s IS the STO with zeta=1: importance exactly 1 there, and equals
    |<g|1s>|^2 = [2 zeta^1.5 * 16/(zeta+1)^3 / (2 sqrt(2))]^2 elsewhere."""
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 1, 0, convthr=1e-10)
    # extract the occupied l=0 radial orbital from the (l,m)-blocked C
    # (lmax=0: single block, block coords == radial coords, column 0 = 1s)
    nrad = b.rb.fem.nbf
    c = np.asarray(res.orbs_a)[0, :nrad, :1]
    zeta = np.array([0.5, 1.0, 2.0])
    I = importance_profile(b.rb, c, 0, zeta, kind="STO")
    # <STO(zeta)|STO(1)> radial overlap = (2 sqrt(zeta))^3 / (zeta+1)^3 * ...
    exact = (8.0 * zeta**1.5 / (zeta + 1.0) ** 3) ** 2
    np.testing.assert_allclose(I, exact, atol=1e-8)
