"""Checkpoint save/load and cross-basis projection tests."""

import numpy as np

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.scf.atomic_scf import scf_atom
from helfem_tpu.utils.checkpoint import (
    cross_radial_overlap,
    load_atomic,
    project_orbitals,
    save_atomic,
)


def test_save_load_roundtrip(tmp_path):
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=20.0, nelem=5, nnodes=8)
    res = scf_atom(b, 1, 1, convthr=1e-8)
    path = str(tmp_path / "he.npz")
    save_atomic(path, b, res)
    b2, d = load_atomic(path)
    assert b2.nbf == b.nbf
    assert abs(float(d["E"]) - res.E) < 1e-14
    assert np.allclose(d["orbs_a"], res.orbs_a)


def test_cross_overlap_same_basis_is_overlap():
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=20.0, nelem=5, nnodes=8)
    S12 = cross_radial_overlap(b.rb, b.rb)
    assert np.abs(S12 - b.rb.overlap()).max() < 1e-11


def test_projection_restart_accelerates():
    """Orbitals from a coarse grid projected onto a finer grid overlap the
    converged fine-grid orbitals almost perfectly."""
    b1 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=20.0, nelem=4, nnodes=7)
    b2 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=20.0, nelem=6, nnodes=9)
    r1 = scf_atom(b1, 1, 1, convthr=1e-8)
    r2 = scf_atom(b2, 1, 1, convthr=1e-8)
    S2 = b2.rb.overlap()
    Cproj = project_orbitals(b2, b1, r1.orbs_a, S2)
    c = Cproj[0][:, 0]
    c = c / np.sqrt(c @ S2 @ c)
    cref = r2.orbs_a[0][:, 0]
    ov = abs(c @ S2 @ cref)
    assert ov > 0.999999
