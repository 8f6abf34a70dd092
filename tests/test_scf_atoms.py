"""End-to-end atomic HF golden-value tests (SURVEY.md stage-5 gates).

Reference values are the numerical Hartree-Fock limits (Froese Fischer et
al.); HelFEM reproduces these to sub-uEh at converged discretization.
"""

import pytest

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.scf.atomic_scf import scf_atom

HF_LIMIT = {
    "He": -2.8616799956,
    "Ne": -128.5470981,
    "Ar": -526.8175128,
}


def test_he_hf():
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 1, 1, convthr=1e-9)
    assert res.converged
    assert abs(res.E - HF_LIMIT["He"]) < 1e-9
    # virial theorem: -E/T = 1
    assert abs(-res.E / res.Ekin - 1.0) < 1e-8
    # 1s orbital energy, HF limit -0.91795556
    assert abs(res.orbE_a[0] + 0.91795556) < 1e-7


def test_be_hf():
    """Be 1s2 2s2: HF limit -14.57302317."""
    b = AtomicBasis(Z=4, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 2, 2, convthr=1e-9)
    assert res.converged
    assert abs(res.E + 14.57302317) < 1e-7


@pytest.mark.parametrize("el,Z,nel", [("Ne", 10, 5), ("Ar", 18, 9)])
def test_closed_shell_hf(el, Z, nel):
    b = AtomicBasis(Z=Z, lmax=1, mmax=1, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, nel, nel, convthr=1e-8, maxit=60)
    assert res.converged
    assert abs(res.E - HF_LIMIT[el]) < 1e-6
    assert abs(-res.E / res.Ekin - 1.0) < 1e-7


def test_atomic_analysis_hydrogen():
    """Post-SCF analysis exact values for H: <r>=1.5, rho(0)=1/pi, cusp=1
    (reference printouts, src/atomic/main.cpp:1000-1059)."""
    import numpy as np

    from helfem_tpu.scf.atomic_scf import atomic_analysis

    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=12)
    r = scf_atom(b, 1, 0, convthr=1e-9)
    a = atomic_analysis(b, r)
    assert abs(a["<r^1>"] - 1.5) < 1e-8
    assert abs(a["density_at_nucleus"] - 1 / np.pi) < 1e-8
    assert abs(a["cusp"] - 1.0) < 1e-7


def test_fixed_occupations_and_perturbation():
    """readocc-style enforced occupations + random orthogonal guess
    perturbation: Be ground configuration reproduces aufbau; an enforced
    1s2 2p2 configuration converges to a higher (excited) solution."""
    b = AtomicBasis(Z=4, lmax=1, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    r1 = scf_atom(b, 2, 2, convthr=1e-8)
    r2 = scf_atom(b, 2, 2, convthr=1e-8, occs={(0, 0): (2, 2)}, perturb=0.01)
    assert abs(r1.E - r2.E) < 1e-10
    r3 = scf_atom(b, 2, 2, convthr=1e-7, occs={(0, 0): (1, 1), (1, 0): (1, 1)}, maxit=80)
    assert r3.converged
    assert r3.E > r1.E + 0.1


def test_krypton_hf_sub_uEh():
    """Heavy closed-shell atom at the numerical HF limit: Kr
    -2752.0549773415 (Cinal, J. Math. Chem. 58, 1571 (2020); Saito 2009
    gives the same to its printed digits). Sub-uEh at this discretization --
    the rebuild's heavy-atom accuracy evidence."""
    b = AtomicBasis(Z=36, lmax=2, mmax=2, rmax=40.0, nelem=8, nnodes=12, zexp=2.5)
    res = scf_atom(b, 18, 18, convthr=1e-9, maxit=60)
    assert res.converged
    assert abs(res.E + 2752.0549773415) < 1e-8


def test_xenon_hf_sub_uEh():
    """Xe HF limit -7232.1383638 (Cinal 2020: -7232.13836380): sub-uEh for
    a Z=54 atom with occupied d shells."""
    b = AtomicBasis(Z=54, lmax=2, mmax=2, rmax=40.0, nelem=8, nnodes=12, zexp=2.5)
    res = scf_atom(b, 27, 27, convthr=1e-9, maxit=80)
    assert res.converged
    assert abs(res.E + 7232.1383638) < 3e-7


def test_scf_control_knobs():
    """Reference-parity SCF controls: --symmetry/--maverage/--dampfock/
    --diisorder/--perturb all converge to the same Ne HF energy
    (src/atomic/main.cpp:63-119 option block)."""
    b = AtomicBasis(Z=10, lmax=1, mmax=1, rmax=30.0, nelem=8, nnodes=10)
    ops = b.build_operators()
    e_ref = scf_atom(b, 5, 5, convthr=1e-8, ops=ops).E
    # forced m-symmetry blocks (symmetry=1) instead of (l,m)
    e_sym1 = scf_atom(b, 5, 5, convthr=1e-8, ops=ops, symmetry=1).E
    assert abs(e_sym1 - e_ref) < 1e-9
    # no symmetry blocking at all
    e_sym0 = scf_atom(b, 5, 5, convthr=1e-8, ops=ops, symmetry=0).E
    assert abs(e_sym0 - e_ref) < 1e-9
    # Fock m-averaging is a no-op at a closed-shell solution
    e_mav = scf_atom(b, 5, 5, convthr=1e-8, ops=ops, maverage=True).E
    assert abs(e_mav - e_ref) < 1e-9
    # MO off-diagonal damping slows but does not change the fixed point
    r_damp = scf_atom(b, 5, 5, convthr=1e-8, ops=ops, dampfock=0.7, dampthr=1e-4,
                      maxit=80)
    assert r_damp.converged and abs(r_damp.E - e_ref) < 1e-9
    # short DIIS history + perturbed guess
    r_p = scf_atom(b, 5, 5, convthr=1e-8, ops=ops, diisorder=5, perturb=0.1, seed=3,
                   maxit=80)
    assert r_p.converged and abs(r_p.E - e_ref) < 1e-9


def test_x_pars_files(tmp_path):
    """--x_pars/--c_pars files fold named parameter overrides into the
    method string (the libxc ext_params equivalent)."""
    from helfem_tpu.cli.atomic import _apply_pars_files
    from helfem_tpu.ops.xc import parse_method

    xp = tmp_path / "x.pars"
    xp.write_text("kappa = 1.245\n# comment\nmu=0.3\n")
    m = _apply_pars_files("gga_x_pbe,gga_c_pbe", str(xp), "")
    funcs, _ = parse_method(m)
    assert dict(funcs[0].params) == {"kappa": 1.245, "mu": 0.3}


def test_zeroder_hip_basis():
    """--zeroder (drop the derivative DOF at Rmax, Hermite bases): one
    fewer radial function, He HF energy unchanged at this Rmax."""
    b0 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=6, nnodes=8, primbas=5)
    b1 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=6, nnodes=8, primbas=5,
                     zeroder=True)
    assert b1.nrad == b0.nrad - 1
    e0 = scf_atom(b0, 1, 1, convthr=1e-8).E
    e1 = scf_atom(b1, 1, 1, convthr=1e-8).E
    assert abs(e0 - e1) < 1e-9


def test_radon_hf_f_shells():
    """Periodic-table breadth: Rn (Z=86, occupied 4f/5d shells, 43+43
    electrons over s/p/d/f symmetry blocks) converges to the numerical HF
    limit -21866.77224 (Saito, ADNDT 95, 836 (2009)) at the 1e-5 level at
    this discretization."""
    b = AtomicBasis(Z=86, lmax=3, mmax=3, rmax=40.0, nelem=8, nnodes=12, zexp=2.5)
    res = scf_atom(b, 43, 43, convthr=1e-9, maxit=80)
    assert res.converged
    assert abs(res.E + 21866.77224) < 1e-5
