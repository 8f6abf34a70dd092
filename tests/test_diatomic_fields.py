"""Diatomic field operators and finite-nucleus tests
(reference: src/diatomic/basis.cpp:819-953, src/diatomic/main.cpp:492-514)."""

import numpy as np
import pytest

from helfem_tpu.models.diatomic import DiatomicBasis
from helfem_tpu.models.diatomic_tools import finite_nucleus_Vnuc, potential_matrix_dia
from helfem_tpu.scf.diatomic_scf import scf_diatomic


@pytest.fixture(scope="module")
def h2p():
    return DiatomicBasis(Z1=1, Z2=1, Rbond=2.0, lmax=(4,), rmax=20.0, nelem=4, nnodes=10)


def _mask(b):
    m = b.shell_mask().reshape(-1)
    return m[:, None] * m[None, :]


def _grid_op(basis, V):
    from helfem_tpu.models.diatomic_dft import build_dia_grid

    g = build_dia_grid(basis, neta=40)
    return potential_matrix_dia(basis, g, V)


def test_quadrupole_vs_grid(h2p):
    """quadrupole_zz (Gaunt-coupled radial integrals) against an independent
    evaluation of z^2 - (x^2+y^2)/2 on the 2D quadrature grid, using
    xi = (r1+r2)/2Rh, eta = (r1-r2)/2Rh."""
    b = h2p
    Rh = b.Rhalf

    def V(r1, r2):
        xi = (r1 + r2) / (2 * Rh)
        eta = (r1 - r2) / (2 * Rh)
        z = Rh * xi * eta
        rho2 = Rh**2 * (xi**2 - 1.0) * (1.0 - eta**2)
        return z**2 - rho2 / 2.0

    Q = b.quadrupole_zz() * _mask(b)
    Qg = _grid_op(b, V)
    assert np.abs(Q - Qg).max() < 1e-8 * max(1.0, np.abs(Q).max())


def test_bz_diamagnetic_vs_grid(h2p):
    """For m=0 shells the Bz operator is purely diamagnetic B^2/8 (x^2+y^2);
    check against the grid evaluation of rho^2."""
    b = h2p
    Rh = b.Rhalf
    B = 0.7

    def V(r1, r2):
        xi = (r1 + r2) / (2 * Rh)
        eta = (r1 - r2) / (2 * Rh)
        rho2 = Rh**2 * (xi**2 - 1.0) * (1.0 - eta**2)
        return (B * B / 8.0) * rho2

    Vb = b.Bz_field(B)
    Vg = _grid_op(b, V)
    assert np.abs(Vb - Vg).max() < 1e-8 * max(1.0, np.abs(Vb).max())


def test_bz_paramagnetic_m_term():
    """With |m|=1 shells present, Bz_field picks up the -B/2 m S term."""
    b = DiatomicBasis(Z1=1, Z2=1, Rbond=2.0, lmax=(2, 2), rmax=15.0, nelem=3, nnodes=8)
    B = 0.5
    Vb = b.Bz_field(B) * _mask(b)
    S = np.asarray(b.overlap()) * _mask(b)
    nrad = b.nrad
    # block of an m=+1 shell: diamagnetic part + (-B/2)*1*S_block
    mplus = [a for a in range(b.nang) if b.mval[a] == 1]
    mminus = [a for a in range(b.nang) if b.mval[a] == -1]
    assert mplus and mminus
    a, c = mplus[0], mminus[0]
    blk_p = Vb[a * nrad:(a + 1) * nrad, a * nrad:(a + 1) * nrad]
    blk_m = Vb[c * nrad:(c + 1) * nrad, c * nrad:(c + 1) * nrad]
    Sblk = S[a * nrad:(a + 1) * nrad, a * nrad:(a + 1) * nrad]
    # difference of +m and -m blocks isolates the paramagnetic term: -B m S
    assert np.abs((blk_p - blk_m) - (-B * Sblk)).max() < 1e-10


def test_h2p_qzz_hellmann_feynman(h2p):
    """First-order Stark shift of a weak quadrupole field matches the
    expectation value (Qzz/3) <quadrupole_zz> (Hellmann-Feynman)."""
    b = h2p
    res0 = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=30)
    # one-electron density from the converged orbitals
    from helfem_tpu.scf.diatomic_scf import density_dia
    import jax.numpy as jnp

    ops = b.build_operators()
    Pa = np.asarray(density_dia(ops, jnp.asarray(res0.orbs_a), jnp.asarray(res0.occ_a)))
    lam = 1e-4
    Q = b.quadrupole_zz() * _mask(b)
    dE_hf = (lam / 3.0) * float(np.vdot(Pa, Q))
    resp = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=40, Qzz=lam)
    resm = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=40, Qzz=-lam)
    dE_num = (resp.E - resm.E) / 2.0
    assert abs(dE_num - dE_hf) < 1e-7 * max(1.0, abs(dE_hf))


def test_h2p_bz_diamagnetic_shift(h2p):
    """H2+ (m=0, single alpha electron) in a weak Bz field: the energy shift
    relative to the -B/2 spin term is the diamagnetic expectation value."""
    b = h2p
    res0 = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=30)
    from helfem_tpu.scf.diatomic_scf import density_dia
    import jax.numpy as jnp

    ops = b.build_operators()
    Pa = np.asarray(density_dia(ops, jnp.asarray(res0.orbs_a), jnp.asarray(res0.occ_a)))
    B = 0.01
    dia = float(np.vdot(Pa, b.Bz_field(B) * _mask(b)))
    resB = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=40, Bz=B)
    dE = resB.E - res0.E + 0.5 * B  # remove the spin Zeeman term
    assert abs(dE - dia) < 5e-3 * abs(dia) + 1e-10


def test_finite_nucleus_vs_point(h2p):
    """Gaussian finite nucleus with a tiny radius reproduces the analytic
    point-nucleus matrix; a physical radius shifts energies upward."""
    b = DiatomicBasis(Z1=1, Z2=1, Rbond=2.0, lmax=(2,), rmax=15.0, nelem=3, nnodes=8)
    Vp = np.asarray(b.build_operators().Vnuc)
    Vf = finite_nucleus_Vnuc(b, "gaussian", 1e-6, 1e-6)
    assert np.abs(Vf - Vp).max() < 1e-6 * np.abs(Vp).max()
    # physical finite nucleus: potential is weaker (less negative energy)
    res0 = scf_diatomic(b, 1, 0, method="HF", convthr=1e-9, maxit=30)
    resf = scf_diatomic(b, 1, 0, method="HF", convthr=1e-9, maxit=30,
                        finitenuc="gaussian", Rrms1=0.01, Rrms2=0.01)
    assert resf.E > res0.E
    assert resf.E - res0.E < 1e-3  # tiny shift at this radius


def test_homonuclear_ez_parity_breaking(h2p):
    """An Ez field on H2+ lowers the energy quadratically (polarizability)
    and symmetrically in +-Ez; requires the g/u block merge."""
    b = h2p
    res0 = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=30)
    f = 0.01
    resp = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=40, Ez=f)
    resm = scf_diatomic(b, 1, 0, method="HF", convthr=1e-10, maxit=40, Ez=-f)
    assert abs(resp.E - resm.E) < 1e-8
    assert resp.E < res0.E - 1e-6  # negative quadratic Stark shift


# ----------------------------------------------------------------------------
# laplacian meta-GGA on the diatomic grid (reference: src/diatomic/dftgrid.cpp
# eval_lf path)
# ----------------------------------------------------------------------------


def test_dia_laplacian_hydrogen_exact():
    """Density laplacian on the prolate grid vs the closed form for the H 1s
    density rho = exp(-2 r1)/pi: lapl rho = 4 rho - 4 rho / r1."""
    import jax.numpy as jnp

    from helfem_tpu.models.diatomic_dft import _fields_dia, build_dia_grid
    from helfem_tpu.scf.diatomic_scf import density_dia

    b = DiatomicBasis(Z1=1, Z2=0, Rbond=1.0, lmax=(8,), rmax=20.0, nelem=4, nnodes=12)
    res = scf_diatomic(b, 1, 0, method="HF", convthr=1e-11, maxit=30)
    assert abs(res.E + 0.5) < 1e-7
    ops = b.build_operators()
    Pa = np.asarray(density_dia(ops, jnp.asarray(res.orbs_a), jnp.asarray(res.occ_a)))
    g = build_dia_grid(b)
    nang, nrad = b.nang, b.nrad
    P4 = Pa.reshape(nang, nrad, nang, nrad).transpose(0, 2, 1, 3)
    P4p = jnp.pad(jnp.asarray(P4), ((0, 0), (0, 0), (0, 1), (0, 1)))
    rho, _, _, tau, lapl = _fields_dia(g, P4p, True, True)
    rho, lapl = np.asarray(rho), np.asarray(lapl)
    # r1 = Rh (cosh mu + eta) on the [e, q, t] grid
    from helfem_tpu.ops.quadrature import gauss_legendre

    eta, _ = gauss_legendre(g.TT.shape[-1])
    r1 = b.Rhalf * (np.cosh(b.mu)[:, :, None] + eta[None, None, :])
    ex_rho = np.exp(-2.0 * r1) / np.pi
    ex_lapl = 4.0 * ex_rho - 4.0 * ex_rho / r1
    sel = ex_rho > 1e-5
    assert np.abs(rho - ex_rho)[sel].max() < 5e-6
    # pointwise agreement away from the nuclear cusp and the interfocal
    # axis (where coth(mu) ~ 1/mu amplifies the basis-set error of the
    # individually non-smooth FEM functions)
    far = (r1 > 2.0) & (r1 < 6.0)
    assert np.abs(lapl - ex_lapl)[far].max() < 3e-3 * np.abs(ex_lapl[far]).max()
    # Green identity over the whole grid: int rho lapl = -int |grad rho|^2
    _, u, v, _, _ = _fields_dia(g, P4p, True, True)
    w = np.asarray(g.w)
    lhs = float(np.sum(w * rho * lapl))
    rhs = -float(np.sum(w * (np.asarray(u) ** 2 + np.asarray(v) ** 2)))
    assert abs(lhs - rhs) < 5e-4 * abs(rhs)


def test_br89_hydrogen_exact_diatomic():
    """BR89 is exact for one-electron densities: Exc evaluated on the
    converged H (Z2=0) density through the full diatomic laplacian pipeline
    must equal -5/16 (the atomic-code gate, now on the prolate grid).

    NOTE: this EXCEEDS the reference, whose diatomic grid throws
    'Laplacian not implemented!' (src/diatomic/dftgrid.cpp:115-116)."""
    import jax.numpy as jnp

    from helfem_tpu.models.diatomic_dft import build_dia_grid, eval_fxc_dia
    from helfem_tpu.ops.xc import parse_method
    from helfem_tpu.scf.diatomic_scf import density_dia

    b = DiatomicBasis(Z1=1, Z2=0, Rbond=1.0, lmax=(12,), rmax=20.0, nelem=4, nnodes=16)
    res = scf_diatomic(b, 1, 0, method="HF", convthr=1e-11, maxit=30)
    ops = b.build_operators()
    Pa = np.asarray(density_dia(ops, jnp.asarray(res.orbs_a), jnp.asarray(res.occ_a)))
    g = build_dia_grid(b)
    funcs, _ = parse_method("mgga_x_br89")
    _, _, Exc, Nel = eval_fxc_dia(tuple(funcs), g, ops, jnp.asarray(Pa),
                                  jnp.zeros_like(jnp.asarray(Pa)))
    assert abs(float(Nel) - 1.0) < 1e-8
    # discretization-convergent: 1.1e-5 (lmax=8) -> 1.3e-6 (10) -> 7.6e-8 (12)
    assert abs(float(Exc) + 0.3125) < 5e-7, float(Exc)


def test_br89_fock_derivative_diatomic():
    """vlapl Fock plumbing on the diatomic grid: Tr(D F) equals the
    directional derivative of Exc (validates every laplacian Fock term)."""
    import jax.numpy as jnp

    from helfem_tpu.models.diatomic_dft import build_dia_grid, eval_fxc_dia
    from helfem_tpu.ops.xc import parse_method

    b = DiatomicBasis(Z1=2, Z2=0, Rbond=2.0, lmax=(3,), rmax=15.0, nelem=3, nnodes=8)
    g = build_dia_grid(b)
    ops = b.build_operators()
    funcs, _ = parse_method("mgga_x_br89")
    rng = np.random.default_rng(0)
    m2 = b.shell_mask().reshape(-1)
    X = rng.standard_normal((b.nbf, b.nbf)) * 0.05
    P = (X @ X.T + 0.05 * np.eye(b.nbf)) * np.outer(m2, m2)
    D = rng.standard_normal((b.nbf, b.nbf)) * 0.01
    D = (D + D.T) * np.outer(m2, m2)

    def E(Pm):
        return float(eval_fxc_dia(tuple(funcs), g, ops, jnp.asarray(Pm), jnp.asarray(Pm))[2])

    Fa, Fb, Exc, Nel = eval_fxc_dia(tuple(funcs), g, ops, jnp.asarray(P), jnp.asarray(P))
    eps = 1e-5
    dE_num = (E(P + eps * D) - E(P - eps * D)) / (2 * eps)
    dE_an = float(jnp.vdot(jnp.asarray(D), Fa + Fb))
    assert abs(dE_num - dE_an) < 1e-6 * max(abs(dE_num), 1.0), (dE_num, dE_an)
