"""Tests of the atomic-1e program (reference: src/sadatom/1e.cpp, the
`1e_atom` binary): exact per-l hydrogenic spectra and the exported
orbital/grid datasets."""

import numpy as np
import pytest


def _run(tmp_path, **kw):
    from helfem_tpu.cli.atomic_1e import main

    save = str(tmp_path / kw.pop("save", "1e.npz"))
    argv = ["--Z", str(kw.pop("Z", 1)), "--nelem", str(kw.pop("nelem", 8)),
            "--save", save]
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    return main(argv), save


def test_hydrogen_spectrum(tmp_path):
    out, _ = _run(tmp_path, Z=1, lmax=2, nelem=10, Rmax=60.0)
    # lowest state of each l is E_n = -1/(2 n^2) with n = l+1; higher
    # states grow tails that feel the Rmax box
    for l in range(3):
        assert out[f"E_{l}"][0] == pytest.approx(
            -0.5 / (l + 1) ** 2, abs=5e-9)
    # deeper bound states of l=0 are radially converged too
    assert out["E_0"][1] == pytest.approx(-0.5 / 4, abs=5e-9)
    assert out["E_0"][2] == pytest.approx(-0.5 / 9, abs=5e-8)


def test_orbitals_normalized_on_exported_grid(tmp_path):
    """The exported (r, wr, orbs_l) triple must integrate |R_nl|^2 r^2 dr
    to 1 -- validating both the orbital values and the grid datasets."""
    out, _ = _run(tmp_path, Z=2, lmax=1, nelem=8)
    r, wr = out["r"], out["wr"]
    for l in range(2):
        R = out[f"orbs_{l}"]
        norms = np.einsum("q,qn->n", wr * r**2, R**2)
        # bound + box states are all normalized
        np.testing.assert_allclose(norms[:5], 1.0, atol=1e-10)


def test_hdf5_export_layout(tmp_path):
    h5py = pytest.importorskip("h5py")
    out, save = _run(tmp_path, Z=1, lmax=1, nelem=6, save="1e.chk")
    with h5py.File(save) as f:
        # arma conventions: vec -> (1, n) dataset, mat -> (ncols, nrows)
        assert np.asarray(f["E_0"]).shape == (1, len(out["E_0"]))
        assert np.asarray(f["orbs_0"]).shape == out["orbs_0"].T.shape
        np.testing.assert_allclose(np.asarray(f["r"]).ravel(), out["r"])
        np.testing.assert_allclose(
            np.asarray(f["orbs_1"]).T, out["orbs_1"])


def test_finite_nucleus_grid_shifts_s_levels(tmp_path):
    """A finite nuclear grid (gaussian sub-grid) must still reproduce the
    point-charge spectrum (the reference program keeps the point
    potential; only the element grid changes, ref src/sadatom/1e.cpp:97)."""
    out, _ = _run(tmp_path, Z=1, lmax=0, nelem=8, finitenuc=2, Rrms=0.01,
                  nelem0=2)
    assert out["E_0"][0] == pytest.approx(-0.5, abs=1e-10)
