"""XC functional and DFT-grid tests (SURVEY.md stage-6 gates)."""

import jax.numpy as jnp
import numpy as np
import pytest

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.models.atomic_dft import build_dft_grid, eval_overlap_grid
from helfem_tpu.ops.xc import get_functional, parse_method, xc_eval
from helfem_tpu.scf.atomic_scf import scf_atom

# NIST "Atomic Reference Data for Electronic Structure Calculations"
# LSD (Slater exchange + VWN correlation) total energies
NIST_LSD = {"He": -2.834836, "Ne": -128.233481, "Ar": -525.946195}


def test_slater_exchange_value():
    # closed-shell: e_x = -(3/4)(3/pi)^{1/3} rho^{4/3}
    f = get_functional("lda_x")
    rho = 0.7
    e = float(f.f(jnp.array(rho / 2), jnp.array(rho / 2), 0.0, 0.0, 0.0))
    exact = -0.75 * (3.0 / np.pi) ** (1 / 3) * rho ** (4 / 3)
    assert abs(e - exact) < 1e-14


def test_pbe_reduces_to_lda_at_zero_gradient():
    z = jnp.array(0.0)
    for pair in [("gga_x_pbe", "lda_x"), ("gga_c_pbe", "lda_c_pw")]:
        g = get_functional(pair[0])
        l = get_functional(pair[1])
        for ra, rb in [(0.3, 0.3), (0.5, 0.1)]:
            eg = float(g.f(jnp.array(ra), jnp.array(rb), z, z, z))
            el = float(l.f(jnp.array(ra), jnp.array(rb), z, z, z))
            assert abs(eg - el) < 1e-12, pair


def test_vwn_pw_agree_roughly():
    """VWN5 and PW92 parametrize the same QMC data; should agree to ~1e-3."""
    v = get_functional("lda_c_vwn")
    p = get_functional("lda_c_pw")
    z = jnp.array(0.0)
    for rho in [0.01, 0.1, 1.0, 10.0]:
        ev = float(v.f(jnp.array(rho / 2), jnp.array(rho / 2), z, z, z)) / rho
        ep = float(p.f(jnp.array(rho / 2), jnp.array(rho / 2), z, z, z)) / rho
        assert abs(ev - ep) < 2e-3 * max(1.0, abs(ev))


def test_xc_eval_derivative_consistency():
    """vrho from xc_eval matches finite differences of the energy density."""
    funcs, _ = parse_method("PBE")
    ra = jnp.array([0.3, 1.2])
    rb = jnp.array([0.2, 0.9])
    s = jnp.array([0.05, 0.4])
    e, vra, vrb, vsaa, vsab, vsbb = xc_eval(funcs, ra, rb, s, 0.5 * s, s)
    h = 1e-6
    ep = xc_eval(funcs, ra + h, rb, s, 0.5 * s, s)[0]
    em = xc_eval(funcs, ra - h, rb, s, 0.5 * s, s)[0]
    assert np.allclose((ep - em) / (2 * h), vra, rtol=1e-5)
    ep = xc_eval(funcs, ra, rb, s + h, 0.5 * s, s)[0]
    em = xc_eval(funcs, ra, rb, s - h, 0.5 * s, s)[0]
    assert np.allclose((ep - em) / (2 * h), vsaa, rtol=1e-4)


def test_grid_reproduces_overlap():
    """The reference's in-run grid self-check (src/atomic/main.cpp:411-441):
    the XC quadrature grid must reproduce the analytic overlap to 1e-10."""
    b = AtomicBasis(Z=10, lmax=2, mmax=1, rmax=30.0, nelem=6, nnodes=10)
    g = build_dft_grid(b)
    S = np.asarray(eval_overlap_grid(g, b.nrad))
    Sref = b.overlap()
    norm = np.sqrt(np.outer(np.diag(Sref), np.diag(Sref)))
    assert np.abs((S - Sref) / norm).max() < 1e-10


def test_he_lsd_vs_nist():
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 1, 1, method="SVWN", convthr=1e-8)
    assert res.converged
    assert abs(res.E - NIST_LSD["He"]) < 1e-6
    assert abs(res.Nelgrid - 2.0) < 1e-9


@pytest.mark.parametrize("el,Z,nel", [("Ne", 10, 5), ("Ar", 18, 9)])
def test_lsd_vs_nist(el, Z, nel):
    b = AtomicBasis(Z=Z, lmax=1, mmax=1, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, nel, nel, method="SVWN", convthr=1e-8, maxit=50)
    assert res.converged
    assert abs(res.E - NIST_LSD[el]) < 1e-6


def test_he_pbe():
    """He PBE total energy, literature numerical limit -2.892936."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 1, 1, method="PBE", convthr=1e-8)
    assert res.converged
    assert abs(res.E + 2.892936) < 2e-5


def test_b88_lyp_on_hf_density():
    """B88 exchange and LYP correlation evaluated on the converged He HF
    density vs the original papers' values (Becke 1988: -1.0255;
    Lee-Yang-Parr 1988: -0.0437)."""
    import jax.numpy as jnp

    from helfem_tpu.ops.xc import get_functional
    from helfem_tpu.utils.linalg import build_blocks, density_blocks

    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    ops = b.build_operators()
    res = scf_atom(b, 1, 1, convthr=1e-9, ops=ops)
    blk_idx, blk_sinvh = build_blocks(np.asarray(ops.S), b.sym_blocks(2))
    P = density_blocks(
        jnp.asarray(res.orbs_a), jnp.asarray(res.occ_a * 2), jnp.asarray(blk_idx), ops.S
    )
    from helfem_tpu.models.atomic_dft import eval_fxc

    g = build_dft_grid(b)
    for name, ref, tol in [
        ("gga_x_b88", -1.0255, 2e-3),
        ("gga_c_lyp", -0.0437, 2e-4),
        ("lda_x", -0.8841, 2e-4),
    ]:
        f = get_functional(name)
        _, _, E, _ = eval_fxc((f,), g, P / 2, P / 2, b.nrad)
        assert abs(float(E) - ref) < tol, (name, float(E))


def test_he_blyp_scf():
    """He BLYP total energy, literature ~ -2.90707."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    res = scf_atom(b, 1, 1, method="BLYP", convthr=1e-8)
    assert res.converged
    assert abs(res.E + 2.90707) < 1e-4


def test_pbe0_hybrid_consistency():
    """PBE0 = 0.25 exact + 0.75 PBE exchange + PBE correlation: the energy
    must sit between HF and PBE and the Exx piece must be ~0.25 of HF's."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    ops = b.build_operators()
    rhf = scf_atom(b, 1, 1, method="HF", convthr=1e-8, ops=ops)
    r0 = scf_atom(b, 1, 1, method="PBE0", convthr=1e-8, ops=ops)
    assert r0.converged
    assert abs(r0.Exx - 0.25 * rhf.Exx) < 5e-3


def test_tpss_h_atom_exactness():
    """TPSS defining constraints on the exact H density (tau = tau_W):
    Ex = -0.3125 exactly, Ec = 0 exactly."""
    import jax.numpy as jnp

    from helfem_tpu.models.atomic_dft import eval_fxc
    from helfem_tpu.ops.xc import get_functional
    from helfem_tpu.utils.linalg import build_blocks, density_blocks, eig_blocks

    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=8, nnodes=12)
    ops = b.build_operators()
    blk_idx, blk_sinvh = build_blocks(np.asarray(ops.S), b.sym_blocks(2))
    E, C = eig_blocks(ops.H0, jnp.asarray(blk_idx), jnp.asarray(blk_sinvh))
    occ = np.zeros(np.asarray(E).shape)
    occ[0, 0] = 1.0
    Pa = density_blocks(C, jnp.asarray(occ), jnp.asarray(blk_idx), ops.S)
    Pb = jnp.zeros_like(Pa)
    g = build_dft_grid(b)
    _, _, Ex, _ = eval_fxc((get_functional("mgga_x_tpss"),), g, Pa, Pb, b.nrad)
    _, _, Ec, _ = eval_fxc((get_functional("mgga_c_tpss"),), g, Pa, Pb, b.nrad)
    assert abs(float(Ex) + 0.3125) < 1e-6
    assert abs(float(Ec)) < 1e-10


def test_tpss_scf_atoms():
    """Self-consistent TPSS: He ~ -2.9096, Ne ~ -128.9811 (literature)."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=40.0, nelem=10, nnodes=15)
    r = scf_atom(b, 1, 1, method="TPSS", convthr=1e-8, maxit=40)
    assert r.converged
    assert abs(r.E + 2.9097) < 5e-4
    b2 = AtomicBasis(Z=10, lmax=1, mmax=1, rmax=40.0, nelem=10, nnodes=15)
    r2 = scf_atom(b2, 5, 5, method="TPSS", convthr=1e-7, maxit=60)
    assert r2.converged
    assert abs(r2.E + 128.9811) < 1e-3


def test_grid_kinetic_check():
    """Grid kinetic matrix vs analytic T (the tau-machinery self-check,
    reference: src/atomic/main.cpp:411-441)."""
    from helfem_tpu.models.atomic_dft import eval_kinetic_grid

    b = AtomicBasis(Z=10, lmax=2, mmax=1, rmax=30.0, nelem=6, nnodes=10)
    g = build_dft_grid(b)
    T = np.asarray(eval_kinetic_grid(g, b.nrad))
    Tref = b.kinetic()
    assert (np.abs(T - Tref) / (1 + np.abs(Tref))).max() < 1e-9


def test_parameter_overrides_exact_limits():
    """gga_x_pbe[mu=0] is exactly LDA exchange (Fx=1); gga_c_pbe[beta=0] is
    exactly PW92 (H=0). Validates the override plumbing end to end."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from helfem_tpu.ops.xc import parse_method, with_params, xc_eval

    ra = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal(50)) + 0.01)
    rb = 0.7 * ra
    s = jnp.asarray(np.abs(np.random.default_rng(2).standard_normal(50)))

    fx0, _ = parse_method("gga_x_pbe[mu=0]")
    flda, _ = parse_method("lda_x")
    e1 = xc_eval(fx0, ra, rb, s, 0.3 * s, s)[0]
    e2 = xc_eval(flda, ra, rb, s, 0.3 * s, s)[0]
    assert np.abs(np.asarray(e1 - e2)).max() < 1e-13

    fc0, _ = parse_method("gga_c_pbe[beta=0]")
    fpw, _ = parse_method("lda_c_pw")
    e3 = xc_eval(fc0, ra, rb, s, 0.3 * s, s)[0]
    e4 = xc_eval(fpw, ra, rb, s, 0.3 * s, s)[0]
    assert np.abs(np.asarray(e3 - e4)).max() < 1e-12

    # bracket-aware split with two params + second functional
    funcs, kfrac = parse_method("gga_x_pbe[kappa=1.245,mu=0.3],gga_c_pbe")
    assert len(funcs) == 2 and kfrac == 0.0
    assert dict(funcs[0].params) == {"kappa": 1.245, "mu": 0.3}

    # aliases
    frev, _ = parse_method("revPBE")
    assert dict(frev[0].params)["kappa"] == 1.245
    fsol, _ = parse_method("PBEsol")
    assert abs(dict(fsol[0].params)["mu"] - 10.0 / 81.0) < 1e-15

    # invalid key rejected
    with pytest.raises(ValueError):
        with_params(flda[0], kappa=1.0)


def test_revpbe_he_energy_direction():
    """revPBE (kappa=1.245) gives stronger exchange than PBE -> lower E."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    e_pbe = scf_atom(b, 1, 1, method="PBE", convthr=1e-7).E
    e_rev = scf_atom(b, 1, 1, method="revPBE", convthr=1e-7).E
    assert e_rev < e_pbe - 1e-3


def test_scan_uniform_gas_limits():
    """SCAN constraints at the uniform gas (sigma = 0, alpha = 1):
    exchange = Slater LDA, correlation = PW92, for several densities and
    spin polarizations."""
    from helfem_tpu.ops.xc import get_functional

    kf1 = (3.0 * np.pi**2) ** (1.0 / 3.0)
    x = get_functional("mgga_x_scan")
    c = get_functional("mgga_c_scan")
    lx = get_functional("lda_x")
    lc = get_functional("lda_c_pw")
    z = jnp.array(0.0)
    for ra, rb in [(0.3, 0.3), (0.5, 0.1), (2.0, 1.0)]:
        # per-spin tau at the uniform-gas value: alpha = 1 in each channel
        ta = 0.3 * kf1**2 * (2.0 * ra) ** (5.0 / 3.0) / 2.0
        tb = 0.3 * kf1**2 * (2.0 * rb) ** (5.0 / 3.0) / 2.0
        ex = float(x.f(jnp.array(ra), jnp.array(rb), z, z, z, jnp.array(ta), jnp.array(tb)))
        el = float(lx.f(jnp.array(ra), jnp.array(rb), z, z, z))
        assert abs(ex - el) < 1e-10, (ra, rb)
        if ra == rb:
            # total alpha = 1 requires zeta = 0 (ds factor)
            ec = float(c.f(jnp.array(ra), jnp.array(rb), z, z, z, jnp.array(ta), jnp.array(tb)))
            epw = float(lc.f(jnp.array(ra), jnp.array(rb), z, z, z))
            assert abs(ec - epw) < 1e-10, (ra, rb)


def test_scan_h_atom_exactness():
    """SCAN defining constraints on the exact H density (alpha = 0,
    zeta = 1): Ex = -0.3125 exactly (h0x = 1.174, a1 = 4.9479 were fixed by
    this), Ec = 0 exactly (g_c(1) = 0)."""
    from helfem_tpu.models.atomic_dft import eval_fxc
    from helfem_tpu.ops.xc import get_functional
    from helfem_tpu.utils.linalg import build_blocks, density_blocks, eig_blocks

    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=8, nnodes=12)
    ops = b.build_operators()
    blk_idx, blk_sinvh = build_blocks(np.asarray(ops.S), b.sym_blocks(2))
    E, C = eig_blocks(ops.H0, jnp.asarray(blk_idx), jnp.asarray(blk_sinvh))
    occ = np.zeros(np.asarray(E).shape)
    occ[0, 0] = 1.0
    Pa = density_blocks(C, jnp.asarray(occ), jnp.asarray(blk_idx), ops.S)
    Pb = jnp.zeros_like(Pa)
    g = build_dft_grid(b)
    _, _, Ex, _ = eval_fxc((get_functional("mgga_x_scan"),), g, Pa, Pb, b.nrad)
    _, _, Ec, _ = eval_fxc((get_functional("mgga_c_scan"),), g, Pa, Pb, b.nrad)
    assert abs(float(Ex) + 0.3125) < 1e-5
    # Ec is analytically zero; numerically the quadrature-level alpha != 0
    # enters FIRST order through (1 - f_c(alpha)) * eps_c1, unlike TPSS's
    # z^2-quadratic SIC, so the floor is ~1e-9 rather than 1e-10
    assert abs(float(Ec)) < 1e-8


def test_scan_scf_smoke():
    """Self-consistent SCAN on He converges to a sane total energy (the
    exact He energy is -2.9037; SCAN lands within ~5 mEh of it)."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    r = scf_atom(b, 1, 1, method="SCAN", convthr=1e-7, maxit=60)
    assert r.converged
    assert abs(r.E + 2.9037) < 1.5e-2


def test_rscan_constraints_and_proximity():
    """rSCAN (regularized SCAN): H-atom exactness is preserved (alpha' = 0
    on one-electron densities), the uniform-gas limit is relaxed only by
    the documented ~6e-5 relative f_x(1) residual, and self-consistent
    energies stay within a few mEh of SCAN."""
    from helfem_tpu.models.atomic_dft import eval_fxc
    from helfem_tpu.ops.xc import get_functional
    from helfem_tpu.utils.linalg import build_blocks, density_blocks, eig_blocks

    # uniform gas: |rscan - lda| / |lda| small but nonzero
    kf1 = (3.0 * np.pi**2) ** (1.0 / 3.0)
    x = get_functional("mgga_x_rscan")
    lx = get_functional("lda_x")
    z = jnp.array(0.0)
    ra = 0.5
    ta = 0.3 * kf1**2 * (2.0 * ra) ** (5.0 / 3.0) / 2.0
    ex = float(x.f(jnp.array(ra), jnp.array(ra), z, z, z, jnp.array(ta), jnp.array(ta)))
    el = float(lx.f(jnp.array(ra), jnp.array(ra), z, z, z))
    assert abs(ex - el) / abs(el) < 5e-4

    # H atom: Ex = -5/16, Ec = 0 still hold
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=40.0, nelem=8, nnodes=12)
    ops = b.build_operators()
    blk_idx, blk_sinvh = build_blocks(np.asarray(ops.S), b.sym_blocks(2))
    E, C = eig_blocks(ops.H0, jnp.asarray(blk_idx), jnp.asarray(blk_sinvh))
    occ = np.zeros(np.asarray(E).shape)
    occ[0, 0] = 1.0
    Pa = density_blocks(C, jnp.asarray(occ), jnp.asarray(blk_idx), ops.S)
    Pb = jnp.zeros_like(Pa)
    g = build_dft_grid(b)
    _, _, Ex, _ = eval_fxc((get_functional("mgga_x_rscan"),), g, Pa, Pb, b.nrad)
    _, _, Ec, _ = eval_fxc((get_functional("mgga_c_rscan"),), g, Pa, Pb, b.nrad)
    assert abs(float(Ex) + 0.3125) < 1e-4
    assert abs(float(Ec)) < 1e-8

    # SCF proximity to SCAN on He
    b2 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    e_scan = scf_atom(b2, 1, 1, method="SCAN", convthr=1e-7, maxit=60).E
    e_rscan = scf_atom(b2, 1, 1, method="rSCAN", convthr=1e-7, maxit=60).E
    assert abs(e_scan - e_rscan) < 5e-3


def test_tpssh_b3lyp_hybrid_consistency():
    """TPSSh (10 % exact exchange) and B3LYP5 (20 %): the exact-exchange
    component scales with the advertised fraction, and the totals sit in
    the physically sensible window around the exact He energy -2.9037."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    ops = b.build_operators()
    rhf = scf_atom(b, 1, 1, method="HF", convthr=1e-8, ops=ops)
    rt = scf_atom(b, 1, 1, method="TPSSh", convthr=1e-7, ops=ops, maxit=60)
    assert rt.converged
    assert abs(rt.Exx - 0.10 * rhf.Exx) < 5e-3
    assert abs(rt.E + 2.9037) < 2e-2
    rb3 = scf_atom(b, 1, 1, method="B3LYP5", convthr=1e-7, ops=ops, maxit=60)
    assert rb3.converged
    assert abs(rb3.Exx - 0.20 * rhf.Exx) < 5e-3
    assert abs(rb3.E + 2.9037) < 2e-2


def test_rpbe_constraints():
    """RPBE exchange (Hammer-Hansen-Norskov 1999): same UEG limit and
    small-s expansion as PBE, stronger enhancement at every s > 0, and the
    same 1 + kappa saturation bound."""
    z = jnp.array(0.0)
    r = get_functional("gga_x_rpbe")
    p = get_functional("gga_x_pbe")
    l = get_functional("lda_x")
    for ra in (0.1, 0.7):
        er = float(r.f(jnp.array(ra), jnp.array(ra), z, z, z))
        el = float(l.f(jnp.array(ra), jnp.array(ra), z, z, z))
        assert abs(er - el) < 1e-12  # UEG limit
    # 1 - e^{-x} > x/(1+x) for x > 0: RPBE Fx > PBE Fx at any finite s,
    # so the (negative) exchange energy density is more negative
    for sig in (1e-3, 0.1, 10.0, 1e4):
        s = jnp.array(sig)
        erp = float(r.f(jnp.array(0.4), jnp.array(0.4), s, z, s))
        epb = float(p.f(jnp.array(0.4), jnp.array(0.4), s, z, s))
        assert erp < epb < 0.0
        # both bounded by the (1 + kappa) * LDA envelope
        elo = (1.0 + 0.804) * float(l.f(jnp.array(0.4), jnp.array(0.4), z, z, z))
        assert erp > elo - 1e-12
    # small-s expansions agree to O(s^4): the Fx difference is
    # (mu s^2/kappa)^2/2, quadratically smaller than the s^2 term itself
    s4, s5 = jnp.array(1e-4), jnp.array(1e-5)
    d4 = abs(float(r.f(jnp.array(0.4), jnp.array(0.4), s4, z, s4))
             - float(p.f(jnp.array(0.4), jnp.array(0.4), s4, z, s4)))
    d5 = abs(float(r.f(jnp.array(0.4), jnp.array(0.4), s5, z, s5))
             - float(p.f(jnp.array(0.4), jnp.array(0.4), s5, z, s5)))
    assert d4 < 1e-10
    assert d5 < 1e-2 * d4  # O(sigma^2) decay of the difference


def test_rpbe_he_scf():
    """RPBE runs through the full SCF machinery; it is a softer-saturating
    enhancement than revPBE but stronger than PBE, so E sits between."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    e_pbe = scf_atom(b, 1, 1, method="PBE", convthr=1e-7).E
    e_rpbe = scf_atom(b, 1, 1, method="RPBE", convthr=1e-7).E
    e_rev = scf_atom(b, 1, 1, method="revPBE", convthr=1e-7).E
    assert e_rpbe < e_pbe - 1e-4
    assert abs(e_rpbe - e_rev) < 5e-2  # same design goal, similar magnitude


def test_dash_pair_method_syntax():
    """The reference's 'x-c' functional pair syntax (parse_xc_func splits
    at the first dash, src/general/dftfuncs.cpp:99-108) parses identically
    to the comma form, without breaking dash-named RS aliases or bracketed
    overrides."""
    from helfem_tpu.ops.xc import parse_method, parse_method_rs

    f1, k1 = parse_method("gga_x_pbe-gga_c_pbe")
    f2, k2 = parse_method("gga_x_pbe,gga_c_pbe")
    assert [f.name for f in f1] == [f.name for f in f2]
    assert k1 == k2 == 0.0
    f3, _ = parse_method("lda_x-lda_c_vwn")
    assert [f.name for f in f3] == ["lda_x", "lda_c_vwn"]
    assert parse_method_rs("lc-lda[omega=0.4]").omega == 0.4
    f4, _ = parse_method("gga_x_pbe[kappa=1.245]-gga_c_pbe")
    assert len(f4) == 2
