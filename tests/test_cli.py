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


def test_diatomic_parity_flags(tmp_path, monkeypatch):
    """The reference-parity diatomic flags (--diag 0 Cholesky whitening,
    --maverage +-m Fock averaging, --mmax single-lmax expansion, --iguess
    id-coded guess, --lpad) must reproduce the default path's converged
    energy exactly (they change the route, not the fixed point).
    Reference: src/diatomic/main.cpp:98-133."""
    monkeypatch.chdir(tmp_path)
    from helfem_tpu.cli.diatomic import main as dia_main

    base = ["--Z1", "H", "--Z2", "H", "--Rbond", "1.4",
            "--nelem", "3", "--nnodes", "6", "--Rmax", "15",
            "--method", "HF", "--convthr", "1e-8"]
    ref = dia_main(base + ["--lmax", "2,2"])
    alt = dia_main(base + ["--lmax", "2", "--mmax", "1", "--diag", "0",
                           "--maverage", "--iguess", "3", "--lpad", "12"])
    assert ref.converged and alt.converged
    assert abs(ref.E - alt.E) < 1e-9


def test_fock_m_average_dia():
    """fock_m_average_dia ties the +-m submatrices together: after one
    application they are equal, a second application is a no-op, and the
    m=0 block is untouched (reference scf::fock_symmetry_average,
    src/general/scf_helpers.cpp:263-283)."""
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import fock_m_average_dia

    basis = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(2, 2, 2), rmax=10.0,
                          nelem=2, nnodes=5)
    nbf = basis.nbf
    rng = np.random.default_rng(0)
    F = rng.standard_normal((nbf, nbf))
    F = F + F.T
    Fav = fock_m_average_dia(F, basis)
    nrad = basis.nrad
    for m in (1, 2):
        sp = sorted((a for a in range(basis.nang) if basis.mval[a] == m),
                    key=lambda a: basis.lval[a])
        sm = sorted((a for a in range(basis.nang) if basis.mval[a] == -m),
                    key=lambda a: basis.lval[a])
        idxp = np.concatenate([np.arange(a * nrad, (a + 1) * nrad) for a in sp])
        idxm = np.concatenate([np.arange(a * nrad, (a + 1) * nrad) for a in sm])
        np.testing.assert_allclose(Fav[np.ix_(idxp, idxp)],
                                   Fav[np.ix_(idxm, idxm)], rtol=0, atol=0)
        # the average preserves the pair sum
        np.testing.assert_allclose(
            Fav[np.ix_(idxp, idxp)] + Fav[np.ix_(idxm, idxm)],
            F[np.ix_(idxp, idxp)] + F[np.ix_(idxm, idxm)], atol=1e-14)
    # m=0 block untouched
    s0 = [a for a in range(basis.nang) if basis.mval[a] == 0]
    idx0 = np.concatenate([np.arange(a * nrad, (a + 1) * nrad) for a in s0])
    np.testing.assert_allclose(Fav[np.ix_(idx0, idx0)], F[np.ix_(idx0, idx0)],
                               rtol=0, atol=0)
    # idempotent
    np.testing.assert_allclose(fock_m_average_dia(Fav, basis), Fav, atol=1e-14)


def test_gensap_parity_flags(tmp_path, monkeypatch):
    """gensap reference-parity knobs (--nquad --shift --iguess --dftthr
    --diisorder/--diiseps/--diisthr --restricted --zeroder --taylor_order)
    run end-to-end and converge to the same fixed point as the defaults
    (src/sadatom/main.cpp:101-143)."""
    monkeypatch.chdir(tmp_path)
    from helfem_tpu.cli.gensap import main as gensap_main

    base = ["--Z", "N", "--lmax", "1", "--nelem", "4", "--nnodes", "7",
            "--Rmax", "20", "--occs", "4,3", "--nosearch", "--maxit", "80"]
    ref = gensap_main(base)
    alt = gensap_main(base + ["--nquad", "35", "--shift", "0.5",
                              "--iguess", "1", "--dftthr", "1e-11",
                              "--diisorder", "8", "--diiseps", "0.05",
                              "--diisthr", "1e-4", "--restricted", "1",
                              "--taylor_order", "4"])
    # different quadrature/knobs change the route, not the physics
    assert abs(ref.E - alt.E) < 1e-7
    # --zeroder with a Hermite basis drops exactly one radial DOF
    from helfem_tpu.models.sadatom import SadAtomBasis

    b0 = SadAtomBasis(Z=7, lmax=1, rmax=20.0, nelem=4, nnodes=4, primbas=5)
    b1 = SadAtomBasis(Z=7, lmax=1, rmax=20.0, nelem=4, nnodes=4, primbas=5,
                      zeroder=True)
    assert b1.nrad == b0.nrad - 1


def test_gensap_spin_resolved_occs(tmp_path, monkeypatch):
    """--occs with 2*(lmax+1) entries + unrestricted mode runs a FIXED
    spin-resolved configuration, and --restricted -1 with lmax+1 entries
    goes through Hund's rules to the same state (reference:
    src/sadatom/main.cpp:578-590 explicit occs, main.cpp:87-95
    translate_occs)."""
    monkeypatch.chdir(tmp_path)
    from helfem_tpu.cli.gensap import main as gensap_main

    base = ["--Z", "N", "--lmax", "1", "--nelem", "4", "--nnodes", "7",
            "--Rmax", "20", "--maxit", "80"]
    r1 = gensap_main(base + ["--occs", "2,3,2,0", "--unrestricted"])
    assert list(r1.occs) == [2, 3] and list(r1.occs_b) == [2, 0]
    r2 = gensap_main(base + ["--occs", "4,3", "--restricted", "-1"])
    assert abs(r1.E - r2.E) < 1e-12
    # spin polarization lowers the energy vs the restricted solve
    r3 = gensap_main(base + ["--occs", "4,3", "--nosearch"])
    assert r1.E < r3.E - 1e-3
