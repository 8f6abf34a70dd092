"""Electric/magnetic field, confinement, and finite-nucleus tests."""

import numpy as np

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.scf.atomic_scf import scf_atom


def test_hydrogen_exact_and_polarizability():
    """H ground state is exactly -0.5 (J+K cancel for one electron); the
    finite-field dipole polarizability must approach the exact alpha=4.5."""
    b = AtomicBasis(Z=1, lmax=2, mmax=0, rmax=40.0, nelem=8, nnodes=10)
    e0 = scf_atom(b, 1, 0, convthr=1e-9, maxit=40).E
    assert abs(e0 + 0.5) < 1e-10
    ez = 0.002
    ep = scf_atom(b, 1, 0, convthr=1e-9, maxit=40, Ez=ez).E
    alpha = -2 * (ep - e0) / ez**2
    assert abs(alpha - 4.5) < 0.05


def test_bz_field_zeeman():
    """H in a weak Bz field: ground state (1s, m=0) shifts by the spin term
    -Bz/2 plus an O(B^2) diamagnetic term <r^2 sin^2>/8 = B^2/4 for 1s."""
    b = AtomicBasis(Z=1, lmax=1, mmax=1, rmax=40.0, nelem=8, nnodes=10)
    e0 = scf_atom(b, 1, 0, convthr=1e-9).E
    Bz = 0.01
    e1 = scf_atom(b, 1, 0, convthr=1e-9, Bz=Bz).E
    # <r^2> = 3 for 1s, <sin^2 theta> = 2/3 -> diamagnetic = B^2/8 * 2 = B^2/4
    expected = e0 - Bz / 2 + Bz**2 / 4
    assert abs(e1 - expected) < 1e-7


def test_confined_hydrogen():
    """H in a hard-wall-ish polynomial cage raises the energy."""
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=10.0, nelem=6, nnodes=10)
    e0 = scf_atom(b, 1, 0, convthr=1e-8).E
    e1 = scf_atom(b, 1, 0, convthr=1e-8, iconf=1, conf_N=10, conf_R=2.0).E
    assert e1 > e0 + 0.1


def test_finite_nucleus_shift():
    """Gaussian finite nucleus raises s-level energies slightly."""
    b = AtomicBasis(Z=80, lmax=0, mmax=0, rmax=30.0, nelem=10, nnodes=12, zexp=3.0)
    e_point = scf_atom(b, 1, 0, convthr=1e-8).E
    e_fin = scf_atom(b, 1, 0, convthr=1e-8, finitenuc="gaussian", Rrms=1e-4).E
    assert e_fin > e_point
    assert e_fin - e_point < 1.0
