"""Diatomic completeness/importance profiles with off-center probes
(reference: src/diatomic/completeness.cpp)."""

import numpy as np

from helfem_tpu.models.diatomic import DiatomicBasis
from helfem_tpu.models.diatomic_cpl import (
    completeness_dia,
    full_orbitals,
    importance_dia,
)
from helfem_tpu.scf.diatomic_scf import scf_diatomic


def test_completeness_saturates_all_centers():
    """A converged prolate FEM basis spans moderate GTOs/STOs at either
    nucleus and the midpoint: Y -> 1. This also validates the probe
    normalization and the off-center geometry (Y = 1 requires the exact
    norm of g(r_c) Y_lm(theta_c))."""
    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(25,), rmax=20.0, nelem=5, nnodes=10)
    S = np.asarray(b.overlap())
    expn = np.array([0.5, 1.0, 2.0])
    for center in ("left", "mid", "right"):
        Y = completeness_dia(b, S, 0, 0, expn, center=center, kind="GTO")
        assert np.all(np.abs(Y - 1.0) < 1e-5), (center, Y)
    # l=1 probe on the midpoint: needs the angular expansion, not just radial
    Ym = completeness_dia(b, S, 1, 0, np.array([1.0]), center="mid", kind="STO")
    assert abs(Ym[0] - 1.0) < 1e-5, Ym
    # off-center probes converge with the angular expansion: lmax 25 beats 8
    b8 = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(8,), rmax=20.0, nelem=5, nnodes=10)
    Y8 = completeness_dia(b8, np.asarray(b8.overlap()), 0, 0, np.array([5.0]), center="left")
    Y25 = completeness_dia(b, S, 0, 0, np.array([5.0]), center="left")
    assert Y25[0] > Y8[0] > 0.9, (Y8, Y25)


def test_importance_matches_atomic_code():
    """He placed at the left focus (Z2=0): the importance of the 1s orbital
    on left-centered STO probes must match the pure atomic machinery."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.ops.lcao import importance_profile
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = DiatomicBasis(Z1=2, Z2=0, Rbond=1.0, lmax=(12,), rmax=25.0, nelem=5, nnodes=10)
    ops = b.build_operators()
    res = scf_diatomic(b, 1, 1, convthr=1e-8, ops=ops)
    assert res.converged
    assert abs(res.E + 2.8616799956) < 1e-6
    C = full_orbitals(ops, res.orbs_a, res.occ_a)
    assert C.shape[1] == 1
    zeta = np.array([1.0, 1.6875, 3.0])
    I_dia = importance_dia(b, C, 0, 0, zeta, center="left", kind="STO")

    ab = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=25.0, nelem=8, nnodes=12)
    ra = scf_atom(ab, 1, 1, convthr=1e-9)
    c = np.asarray(ra.orbs_a)[0, : ab.rb.fem.nbf, :1]
    I_at = importance_profile(ab.rb, c, 0, zeta, kind="STO")
    # two independent discretizations (prolate 2D vs radial 1D): ~1e-5
    assert np.abs(I_dia - I_at).max() < 1e-5, (I_dia, I_at)
