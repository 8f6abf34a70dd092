"""Reference-schema HDF5 checkpoint interop (utils/checkpoint_h5.py vs the
layout of the reference Checkpoint class, ref src/general/checkpoint.cpp)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def test_arma_storage_conventions(tmp_path):
    """The on-disk layout must match the reference exactly: arma::mat
    datasets have shape (n_cols, n_rows) holding the column-major buffer
    (checkpoint.cpp:130-133), arma::ivec -> (n, 1) int
    (checkpoint.cpp:236-238), scalars are H5S_SCALAR."""
    from helfem_tpu.utils.checkpoint_h5 import (
        _r_ivec,
        _r_mat,
        _r_scalar,
        _r_vec,
        _w_int,
        _w_ivec,
        _w_mat,
        _w_vec,
    )

    p = str(tmp_path / "conv.h5")
    M = np.arange(6.0).reshape(2, 3)  # non-symmetric, non-square
    v = np.array([1.5, 2.5, 3.5])
    iv = np.array([3, 1, 4, 1])
    with h5py.File(p, "w") as f:
        _w_mat(f, "M", M)
        _w_vec(f, "v", v)
        _w_ivec(f, "iv", iv)
        _w_int(f, "n", 7)
    with h5py.File(p, "r") as f:
        # dataset shape is (n_cols, n_rows); the raw C-order buffer equals
        # the Armadillo column-major buffer of M
        assert f["M"].shape == (3, 2)
        np.testing.assert_array_equal(
            np.asarray(f["M"]).ravel(), M.flatten(order="F"))
        assert f["v"].shape == (1, 3)
        assert f["iv"].shape == (4, 1) and f["iv"].dtype == np.int32
        assert f["n"].shape == () and f["n"].dtype == np.int32
        np.testing.assert_array_equal(_r_mat(f, "M"), M)
        np.testing.assert_array_equal(_r_vec(f, "v"), v)
        np.testing.assert_array_equal(_r_ivec(f, "iv"), iv)
        assert int(_r_scalar(f, "n")) == 7


def test_atomic_chk_roundtrip(tmp_path):
    """He HF -> .chk -> reload: reference basis keys present, orbitals
    S-orthonormal and energy-sorted, tr(P S) = N_el, and the warm start
    reconverges to the same energy in one DIIS-converged pass."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom
    from helfem_tpu.utils.checkpoint_h5 import (
        load_atomic_chk,
        save_atomic_chk,
        warm_start_density_atomic_h5,
    )

    basis = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=5, nnodes=8)
    res = scf_atom(basis, 1, 1, method="HF", convthr=1e-8)
    assert res.converged
    p = str(tmp_path / "he.chk")
    save_atomic_chk(p, basis, res, 1, 1)

    with h5py.File(p, "r") as f:
        for key in ("HelFEM_ID", "Z", "Zl", "Zr", "Rhalf", "bval",
                    "finitenuc", "Rrms", "n_quad", "poly_id", "poly_nnodes",
                    "zeroder", "taylor_order", "lval", "mval", "nela",
                    "nelb", "S", "T", "Vuc", "Sinvh", "Sh", "P", "Pa", "Pb",
                    "Ca", "Cb", "Ea", "Eb"):
            assert key in f, key
        assert int(np.asarray(f["HelFEM_ID"])[()]) == 1

    b2, d = load_atomic_chk(p)
    assert b2.nbf == basis.nbf
    S, Ca, Ea = d["S"], d["Ca"], d["Ea"]
    G = Ca.T @ S @ Ca
    assert abs(G - np.eye(G.shape[0])).max() < 1e-10
    assert (np.diff(Ea) >= -1e-12).all()
    assert abs(np.trace(d["P"] @ S) - 2.0) < 1e-10

    P0a, P0b = warm_start_density_atomic_h5(b2, b2, d)
    res2 = scf_atom(b2, 1, 1, method="HF", convthr=1e-8, P0a=P0a, P0b=P0b)
    assert res2.converged and res2.niter <= 3
    assert abs(res2.E - res.E) < 1e-10


def test_atomic_chk_cross_basis(tmp_path):
    """A .chk written on one element grid warm-starts a run on a finer
    grid through the S11^-1 S12 projector (reference --load restart,
    src/atomic/main.cpp:508-609)."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom
    from helfem_tpu.utils.checkpoint_h5 import (
        load_atomic_chk,
        save_atomic_chk,
        warm_start_density_atomic_h5,
    )

    b1 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=4, nnodes=8)
    r1 = scf_atom(b1, 1, 1, method="HF", convthr=1e-8)
    p = str(tmp_path / "he4.chk")
    save_atomic_chk(p, b1, r1, 1, 1)
    bold, d = load_atomic_chk(p)
    b2 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=6, nnodes=8)
    P0a, P0b = warm_start_density_atomic_h5(b2, bold, d)
    assert abs(np.trace(P0a @ b2.overlap()) - 1.0) < 1e-6
    r2 = scf_atom(b2, 1, 1, method="HF", convthr=1e-8, P0a=P0a, P0b=P0b)
    assert r2.converged and r2.niter <= 6
    assert abs(r2.E + 2.8616799956) < 1e-7


def test_diatomic_chk_roundtrip(tmp_path):
    """H2 HF -> .chk (reference pure-function layout: first radial function
    of every m != 0 shell dropped, ref basis.cpp:461-472) -> reload ->
    warm start reconverges to the same energy."""
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import scf_diatomic
    from helfem_tpu.utils.checkpoint_h5 import (
        _pure_indices,
        load_diatomic_chk,
        save_diatomic_chk,
        warm_start_density_dia_h5,
    )

    basis = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(2, 2), rmax=15.0,
                          nelem=2, nnodes=6)
    res = scf_diatomic(basis, 1, 1, method="HF", convthr=1e-8)
    assert res.converged
    p = str(tmp_path / "h2.chk")
    save_diatomic_chk(p, basis, res, 1, 1)

    keep = _pure_indices(basis)
    with h5py.File(p, "r") as f:
        assert int(np.asarray(f["HelFEM_ID"])[()]) == 2
        # the stored matrices are compacted to the reference's Nbf
        assert f["S"].shape == (len(keep), len(keep))
        assert "Vnuc" in f and "Enucr" in f

    b2, d = load_diatomic_chk(p)
    assert b2.nbf == basis.nbf
    assert b2.lmax == basis.lmax
    S = d["S"]
    G = d["Ca"].T @ S @ d["Ca"]
    assert abs(G - np.eye(G.shape[0])).max() < 1e-7
    assert abs(np.trace(d["P"] @ S) - 2.0) < 1e-8

    P0a, P0b = warm_start_density_dia_h5(b2, b2, d)
    res2 = scf_diatomic(b2, 1, 1, method="HF", convthr=1e-8,
                        P0a=P0a, P0b=P0b)
    assert res2.converged
    assert abs(res2.E - res.E) < 1e-9


def test_dline_dgrid_read_chk(tmp_path, monkeypatch):
    """The density post-processing CLIs read reference-schema HDF5
    checkpoints directly (like the reference's diatomic_dline/dgrid,
    density_line.cpp:37-104), using the stored compacted density."""
    monkeypatch.chdir(tmp_path)
    from helfem_tpu.cli.diatomic import main as dia_main
    from helfem_tpu.cli.diatomic_dline import main as dline_main

    ck = str(tmp_path / "h2.chk")
    dia_main(["--Z1", "H", "--Z2", "H", "--Rbond", "1.4", "--lmax", "2,2",
              "--nelem", "2", "--nnodes", "6", "--Rmax", "15",
              "--method", "HF", "--convthr", "1e-7", "--save", ck])
    dline_main(["--load", ck, "--output", str(tmp_path / "dl.dat"),
                "--npts", "40"])
    dl = np.loadtxt(tmp_path / "dl.dat")
    assert dl.shape == (40, 2)
    n_mid = dl[np.abs(dl[:, 0]).argmin(), 1]
    n_nuc = dl[np.abs(dl[:, 0] - 0.7).argmin(), 1]
    assert 0.0 < n_mid < n_nuc


# --- golden fixtures (bytes NOT produced by this repo's writer) -----------------


_FIXDIR = __import__("os").path.join(__import__("os").path.dirname(__file__),
                                     "fixtures")


def test_golden_atomic_chk_fixture():
    """Load a committed reference-layout atomic .chk whose bytes were
    assembled by an independent raw-h5py generator replicating the
    reference Checkpoint call sequence (tests/fixtures/make_golden_chk.py,
    ref src/general/checkpoint.cpp:117-258,477-508) -- NOT by
    save_atomic_chk. Guards the reader against layout drift: basis
    reconstruction, arma storage conventions, orthonormality, electron
    count, and a warm start that reconverges in <= 3 iterations."""
    import os

    from helfem_tpu.scf.atomic_scf import scf_atom
    from helfem_tpu.utils.checkpoint_h5 import (
        load_atomic_chk,
        warm_start_density_atomic_h5,
    )

    p = os.path.join(_FIXDIR, "he_hf_ref_layout.chk")
    with h5py.File(p, "r") as f:
        # raw layout spot checks (arma conventions, scalar datasets)
        assert f["HelFEM_ID"].shape == () and f["HelFEM_ID"].dtype == np.int32
        assert f["lval"].ndim == 2 and f["lval"].shape[1] == 1
        assert f["bval"].shape[0] == 1
        nbf_file = f["S"].shape[0]
        assert f["Ca"].shape[1] == nbf_file  # (n_cols, n_rows) mat layout
        # the resolved taylor_order the reference binary writes (nprim-1)
        assert int(np.asarray(f["taylor_order"])[()]) == 5

    basis, d = load_atomic_chk(p)
    assert basis.Z == 2 and basis.lmax == 1 and basis.nnodes == 6
    assert basis.nbf == d["S"].shape[0]
    S, Ca = d["S"], d["Ca"]
    G = Ca.T @ S @ Ca
    assert abs(G - np.eye(G.shape[0])).max() < 1e-9
    assert abs(np.trace(d["P"] @ S) - 2.0) < 1e-9
    # our own basis reproduces the stored one-electron matrices exactly
    np.testing.assert_allclose(basis.overlap(), S, atol=1e-12)
    np.testing.assert_allclose(basis.kinetic(), d["T"], atol=1e-10)

    P0a, P0b = warm_start_density_atomic_h5(basis, basis, d)
    res = scf_atom(basis, d["nela"], d["nelb"], method="HF", convthr=1e-8,
                   P0a=P0a, P0b=P0b)
    assert res.converged and res.niter <= 3
    assert abs(res.E - (-2.861610216958)) < 1e-8


def test_golden_diatomic_chk_fixture():
    """Same for the diatomic reader: committed H2 fixture in the
    reference's compacted pure-function layout (first radial function of
    every m != 0 shell dropped, ref src/diatomic/basis.cpp:461-472)."""
    import os

    from helfem_tpu.scf.diatomic_scf import scf_diatomic
    from helfem_tpu.utils.checkpoint_h5 import (
        _pure_indices,
        load_diatomic_chk,
        warm_start_density_dia_h5,
    )

    p = os.path.join(_FIXDIR, "h2_hf_ref_layout.chk")
    basis, d = load_diatomic_chk(p)
    assert basis.Z1 == 1 and basis.Z2 == 1
    assert abs(basis.Rbond - 1.4) < 1e-12
    keep = _pure_indices(basis)
    assert d["S"].shape == (len(keep), len(keep))
    G = d["Ca"].T @ d["S"] @ d["Ca"]
    assert abs(G - np.eye(G.shape[0])).max() < 1e-8
    assert abs(np.trace(d["P"] @ d["S"]) - 2.0) < 1e-9

    P0a, P0b = warm_start_density_dia_h5(basis, basis, d)
    res = scf_diatomic(basis, d["nela"], d["nelb"], method="HF",
                       convthr=1e-8, P0a=P0a, P0b=P0b)
    assert res.converged
    assert abs(res.E - (-1.127614145385)) < 1e-8
