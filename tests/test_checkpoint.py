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


def test_diatomic_save_load_warmstart(tmp_path):
    """H2 checkpoint round-trip; warm start converges in fewer iterations."""
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import density_dia, scf_diatomic
    from helfem_tpu.utils.checkpoint import load_diatomic, save_diatomic

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(4, 4), rmax=20.0, nelem=4, nnodes=8)
    res = scf_diatomic(b, 1, 1, convthr=1e-8)
    assert res.converged
    path = str(tmp_path / "h2.npz")
    save_diatomic(path, b, res)
    b2, d = load_diatomic(path)
    assert b2.nbf == b.nbf and tuple(b2.lmax) == tuple(b.lmax)
    assert abs(float(d["E"]) - res.E) < 1e-14

    ops = b2.build_operators()
    import jax.numpy as jnp

    P0 = np.asarray(density_dia(ops, jnp.asarray(d["orbs_a"]), jnp.asarray(d["occ_a"])))
    res2 = scf_diatomic(b2, 1, 1, convthr=1e-8, ops=ops, P0a=P0)
    assert res2.converged
    assert abs(res2.E - res.E) < 1e-8
    assert res2.niter < res.niter


def test_sadatom_save_load(tmp_path):
    from helfem_tpu.models.sadatom import SadAtomBasis, solve_sadatom
    from helfem_tpu.utils.checkpoint import load_sadatom, save_sadatom

    b = SadAtomBasis(Z=6, lmax=2, rmax=20.0, nelem=5, nnodes=8)
    res = solve_sadatom(b, method="LDA")
    path = str(tmp_path / "c.npz")
    save_sadatom(path, b, res)
    b2, d = load_sadatom(path)
    assert b2.nrad == b.nrad
    assert abs(float(d["E"]) - res.E) < 1e-14
    assert np.allclose(d["Pl"], res.Pl)
    assert np.allclose(d["occs"], res.occs)


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
