"""CLI smoke tests: each program's main() runs in-process with fast
parameters and produces physically-correct output."""

import numpy as np


def test_harmonic_cli():
    from helfem_tpu.cli.harmonic import main

    E = main(["--nelem", "12", "--nnodes", "12", "--neig", "5"])
    assert np.abs(E - (np.arange(5) + 0.5)).max() < 1e-8


def test_softcoulomb_cli():
    from helfem_tpu.cli.softcoulomb import main

    E = main(["--nelem", "14", "--nnodes", "10", "--neig", "3"])
    # 1D soft-Coulomb a=1 ground state (well-known value ~ -0.6698)
    assert abs(E[0] + 0.66977) < 1e-3
    assert np.all(np.diff(E) > 0)


def test_atomic_cli(tmp_path, monkeypatch):
    from helfem_tpu.cli.atomic import main

    monkeypatch.chdir(tmp_path)
    res = main([
        "--Z", "He", "--lmax", "0", "--mmax", "0", "--nelem", "6",
        "--nnodes", "10", "--method", "HF", "--convthr", "1e-8",
        "--save", str(tmp_path / "he.npz"),
    ])
    assert res.converged
    assert abs(res.E + 2.8616799956) < 1e-7
    assert (tmp_path / "he.npz").exists()


def test_diatomic_1e_cli():
    from helfem_tpu.cli.diatomic_1e import main

    out = main([
        "--Z1", "H", "--Z2", "H", "--Rbond", "2.0", "--lmax", "10",
        "--nelem", "3", "--nnodes", "12", "--Rmax", "20", "--neig", "1",
    ])
    # exact H2+ ground state at R=2
    E0 = out[0] if np.ndim(out) else out
    assert abs(float(np.ravel(out)[0]) + 1.1026342145) < 1e-6


def test_diatomic_dline_dgrid_cli(tmp_path, monkeypatch):
    """Density post-processing programs (reference: diatomic_dline/dgrid):
    run H2 HF, then extract the axis line and half-plane densities."""
    monkeypatch.chdir(tmp_path)
    from helfem_tpu.cli.diatomic import main as dia_main
    from helfem_tpu.cli.diatomic_dgrid import main as dgrid_main
    from helfem_tpu.cli.diatomic_dline import main as dline_main

    ck = str(tmp_path / "h2.npz")
    res = dia_main(["--Z1", "H", "--Z2", "H", "--Rbond", "1.4", "--lmax", "4",
                    "--nelem", "3", "--nnodes", "6", "--Rmax", "15",
                    "--method", "HF", "--convthr", "1e-7", "--save", ck])
    assert res.converged
    assert res.orbsym_a[0] == "sigmag"  # H2 ground state is 1 sigma_g
    dline_main(["--load", ck, "--output", str(tmp_path / "dl.dat"), "--npts", "50"])
    dgrid_main(["--load", ck, "--output", str(tmp_path / "dg.dat"),
                "--nz", "20", "--nrho", "10"])
    dl = np.loadtxt(tmp_path / "dl.dat")
    assert dl.shape == (50, 2)
    # density peaks at the nuclei (z = +-0.7), not the midpoint
    n_mid = dl[np.abs(dl[:, 0]).argmin(), 1]
    n_nuc = dl[np.abs(dl[:, 0] - 0.7).argmin(), 1]
    assert 0.0 < n_mid < n_nuc
    dg = np.loadtxt(tmp_path / "dg.dat")
    assert dg.shape == (200, 3) and dg[:, 2].min() >= 0.0
