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
