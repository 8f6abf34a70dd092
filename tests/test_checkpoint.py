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


def test_save_load_zeroder_roundtrip(tmp_path):
    """--zeroder runs must reload with the same basis dimension (the flag
    drops one radial derivative DOF; losing it on reload shifted shapes)."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=20.0, nelem=5, nnodes=8,
                    zeroder=True)
    res = scf_atom(b, 1, 1, convthr=1e-8)
    path = str(tmp_path / "he0.npz")
    save_atomic(path, b, res)
    b2, d = load_atomic(path)
    assert b2.zeroder
    assert b2.nbf == b.nbf
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


def test_kill_and_restart_resumes(tmp_path):
    """Crash recovery: a run killed after 3 iterations leaves a usable
    per-iteration checkpoint; warm-starting from it converges to the same
    energy as an uninterrupted run (reference: per-iteration HDF5 writes +
    --load, src/atomic/main.cpp:735-737,507-609)."""
    from types import SimpleNamespace

    from helfem_tpu.utils.checkpoint import (
        load_atomic,
        save_atomic,
        warm_start_density,
    )

    b = AtomicBasis(Z=4, lmax=0, mmax=0, rmax=30.0, nelem=5, nnodes=8)
    full = scf_atom(b, 2, 2, convthr=1e-9, maxit=50)
    assert full.converged

    path = str(tmp_path / "crash.npz")
    saves = []

    def cb(it, E, Ea, Ca, occa, Eb, Cb, occb):
        st = SimpleNamespace(
            converged=False, E=E, orbE_a=np.sort(Ea.ravel()),
            orbs_a=np.asarray(Ca), occ_a=occa,
            orbE_b=None, orbs_b=None, occ_b=None,
        )
        save_atomic(path, b, st)
        saves.append(it)

    part = scf_atom(b, 2, 2, convthr=1e-9, maxit=3, save_cb=cb)
    assert not part.converged and len(saves) >= 3

    oldb, d = load_atomic(path)
    P0a, P0b = warm_start_density(b, oldb, d)
    res = scf_atom(b, 2, 2, convthr=1e-9, maxit=50, P0a=P0a, P0b=P0b)
    assert res.converged
    assert abs(res.E - full.E) < 1e-8
    assert res.niter <= full.niter


def test_cross_basis_restart_on_finer_grid(tmp_path):
    """--load onto a DIFFERENT discretization: coarse-grid Be orbitals
    projected onto a finer grid converge to the fine-grid energy faster
    than a cold start (reference: cross-basis overlap restart,
    libhelfem/src/RadialBasis.cpp:211-309)."""
    from types import SimpleNamespace

    from helfem_tpu.utils.checkpoint import (
        load_atomic,
        save_atomic,
        warm_start_density,
    )

    b1 = AtomicBasis(Z=4, lmax=0, mmax=0, rmax=30.0, nelem=4, nnodes=7)
    r1 = scf_atom(b1, 2, 2, convthr=1e-8, maxit=50)
    path = str(tmp_path / "coarse.npz")
    save_atomic(path, b1, r1)

    b2 = AtomicBasis(Z=4, lmax=0, mmax=0, rmax=30.0, nelem=6, nnodes=9)
    cold = scf_atom(b2, 2, 2, convthr=1e-9, maxit=50)
    oldb, d = load_atomic(path)
    P0a, P0b = warm_start_density(b2, oldb, d)
    warm = scf_atom(b2, 2, 2, convthr=1e-9, maxit=50, P0a=P0a, P0b=P0b)
    assert warm.converged
    assert abs(warm.E - cold.E) < 1e-9
    assert warm.niter <= cold.niter


def test_diatomic_cross_basis_warm_start():
    """Cross-basis diatomic restart: an H2 HF checkpoint from a coarse
    discretization warm-starts a finer one, reproducing the direct fine-
    basis energy and converging faster than a cold start (reference:
    src/diatomic/main.cpp --load restart projection)."""
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import scf_diatomic
    from helfem_tpu.utils.checkpoint import (
        cross_overlap_dia,
        save_diatomic,
        load_diatomic,
        warm_start_density_dia,
    )

    coarse = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(4,), rmax=15.0, nelem=3, nnodes=6)
    r0 = scf_diatomic(coarse, 1, 1, convthr=1e-8, maxit=40)
    assert r0.converged
    path = "/tmp/h2_coarse_ckpt.npz"
    save_diatomic(path, coarse, r0)
    bold, d = load_diatomic(path)

    fine = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(6,), rmax=15.0, nelem=4, nnodes=8)
    # sanity: cross overlap against itself reproduces the basis overlap
    Sself = cross_overlap_dia(fine, fine)
    assert np.abs(Sself - fine.overlap()).max() < 1e-10

    P0a, P0b = warm_start_density_dia(fine, bold, d)
    assert P0b is None
    # the projected density carries the right electron count
    nel = float(np.sum(P0a * fine.overlap()))
    assert abs(nel - 1.0) < 1e-3

    r_warm = scf_diatomic(fine, 1, 1, convthr=1e-8, maxit=40, P0a=P0a)
    r_cold = scf_diatomic(fine, 1, 1, convthr=1e-8, maxit=40)
    assert r_warm.converged
    assert abs(r_warm.E - r_cold.E) < 1e-7
    assert r_warm.niter <= r_cold.niter
