"""Atomic DFT quadrature grid and XC Fock build (L6), incl. meta-GGA tau.

Redesign of atomic::dftgrid (src/atomic/dftgrid.{cpp,h}):

* The reference evaluates complex basis functions chi, grad chi on a 3D
  (r, theta, phi) product grid per element under OpenMP with an even/odd
  element sweep to avoid write races. Here the phi dimension is ELIMINATED
  ANALYTICALLY: with the density matrix m-block-diagonal (always true under
  the axial/full symmetry the reference enforces, TwoDBasis::get_sym_idx),
  rho, grad rho, tau and all XC matrix elements are phi-independent, and the
  angular factors reduce to REAL products of normalized associated Legendre
  functions Theta_a(theta) = Pbar_{l_a}^{|m_a|}(cos theta). The grid is
  (element, radial point, theta point) with a Gauss-Legendre theta rule
  (interior nodes avoid the sin(theta)=0 endpoints of the m>0 angular
  derivative products), all contractions are batched einsums, and the global
  Fock assembly is one scatter-add (race-free by construction).

* XC energies/potentials from helfem_tpu.ops.xc (autodiff vrho/vsigma/vtau).

Grid layout per element e: points (q, t) with weight
    w[e,q,t] = wr[e,q] * r[e,q]^2 * wth[t] * 2*pi.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, _from4, _pad_rad, _to4
from helfem_tpu.ops.quadrature import gauss_legendre
from helfem_tpu.ops.spherical import legendre_Pbar, ylm_dtheta
from helfem_tpu.ops.xc import xc_eval

__all__ = ["DFTGridOps", "build_dft_grid", "eval_fxc", "eval_overlap_grid", "eval_kinetic_grid"]


class DFTGridOps(NamedTuple):
    """Device constants for the XC grid."""

    bg: jnp.ndarray  # [nelem, nq, nprim] radial b values
    dbg: jnp.ndarray  # [nelem, nq, nprim] radial db/dr
    r: jnp.ndarray  # [nelem, nq]
    w2: jnp.ndarray  # [nelem, nq] radial weight incl. r^2 and 2 pi
    wth: jnp.ndarray  # [nt] theta weights (in cos theta)
    TT: jnp.ndarray  # [nang, nang, nt] Theta_a Theta_b * delta_{ma,mb}
    dTT: jnp.ndarray  # [nang, nang, nt] (Theta'_a Theta_b + Theta_a Theta'_b)
    dTT2: jnp.ndarray  # [nang, nang, nt] Theta'_a Theta'_b (for tau)
    TTm2: jnp.ndarray  # [nang, nang, nt] m_a m_b Theta Theta / sin^2 (for tau)
    gidx: jnp.ndarray  # [nelem, nprim]
    d2bg: jnp.ndarray  # [nelem, nq, nprim] radial d2b/dr2 (for lapl)
    LTT: jnp.ndarray  # [nang, nang, nt] angular laplacian of Theta_a Theta_b:
    #   2 Theta'_a Theta'_b + (2 m^2/sin^2 - l_a(l_a+1) - l_b(l_b+1)) TT


def build_dft_grid(basis: AtomicBasis, ntheta: int = 0) -> DFTGridOps:
    """Host-side grid constants. ntheta=0 -> 2*lmax + 12 Gauss-Legendre
    points in cos(theta) (integrates Legendre products of degree 4*lmax+22
    exactly, beyond the reference's ldft = 4*lmax + 10 default,
    src/atomic/main.cpp:389-396)."""
    if ntheta == 0:
        ntheta = 2 * basis.lmax + 12
    cth, wth = gauss_legendre(ntheta)
    lmax = int(basis.lval.max())
    P = legendre_Pbar(lmax, cth)  # [l, m, nt]
    D = ylm_dtheta(lmax, cth)  # d/dtheta
    sin2 = 1.0 - cth**2
    nang = basis.nang
    Th = np.zeros((nang, ntheta))
    dTh = np.zeros((nang, ntheta))
    for a in range(nang):
        Th[a] = P[basis.lval[a], abs(basis.mval[a])]
        dTh[a] = D[basis.lval[a], abs(basis.mval[a])]
    same_m = (basis.mval[:, None] == basis.mval[None, :]).astype(np.float64)
    TT = same_m[:, :, None] * Th[:, None, :] * Th[None, :, :]
    dTT = same_m[:, :, None] * (dTh[:, None, :] * Th[None, :, :] + Th[:, None, :] * dTh[None, :, :])
    dTT2 = same_m[:, :, None] * dTh[:, None, :] * dTh[None, :, :]
    mm = (basis.mval[:, None] * basis.mval[None, :]).astype(np.float64)
    TTm2 = same_m[:, :, None] * mm[:, :, None] * Th[:, None, :] * Th[None, :, :] / sin2[None, None, :]
    ll = basis.lval * (basis.lval + 1.0)
    LTT = 2.0 * dTT2 + 2.0 * TTm2 - (ll[:, None] + ll[None, :])[:, :, None] * TT
    rb = basis.rb
    return DFTGridOps(
        bg=jnp.asarray(rb.b),
        dbg=jnp.asarray(rb.db),
        r=jnp.asarray(rb.r),
        w2=jnp.asarray(rb.wr * rb.r**2 * 2.0 * np.pi),
        wth=jnp.asarray(wth),
        TT=jnp.asarray(TT),
        dTT=jnp.asarray(dTT),
        dTT2=jnp.asarray(dTT2),
        TTm2=jnp.asarray(TTm2),
        gidx=jnp.asarray(rb.fem.gidx),
        d2bg=jnp.asarray(rb.d2b),
        LTT=jnp.asarray(LTT),
    )


def _density_fields(g: DFTGridOps, P4p: jnp.ndarray, need_tau: bool, need_lapl: bool = False):
    """rho, drho/dr, (1/r) drho/dtheta [, tau][, lapl] on the [e, q, t] grid."""
    gi = g.gidx
    Pg = P4p[:, :, gi[:, :, None], gi[:, None, :]]  # [a,b,e,i,j]
    D1 = jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.bg, g.bg)
    Ddr = 2.0 * jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.dbg, g.bg)
    rho = jnp.einsum("abeq,abt->eqt", D1, g.TT)
    drho_r = jnp.einsum("abeq,abt->eqt", Ddr, g.TT)
    drho_t = jnp.einsum("abeq,abt->eqt", D1, g.dTT) / g.r[:, :, None]
    tau = lapl = None
    if need_tau or need_lapl:
        Ddd = jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.dbg, g.dbg)
    if need_tau:
        tau = 0.5 * (
            jnp.einsum("abeq,abt->eqt", Ddd, g.TT)
            + jnp.einsum("abeq,abt->eqt", D1, g.dTT2 + g.TTm2) / g.r[:, :, None] ** 2
        )
    if need_lapl:
        # lapl = rho_rr + (2/r) rho_r + (1/r^2) * angular laplacian
        D2r = 2.0 * jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.d2bg, g.bg) + 2.0 * Ddd
        lapl = (
            jnp.einsum("abeq,abt->eqt", D2r, g.TT)
            + 2.0 * drho_r / g.r[:, :, None]
            + jnp.einsum("abeq,abt->eqt", D1, g.LTT) / g.r[:, :, None] ** 2
        )
    return rho, drho_r, drho_t, tau, lapl


def _scatter_f(g: DFTGridOps, Fel: jnp.ndarray, nang: int, nrad: int):
    gi = g.gidx
    F4 = jnp.zeros((nang, nang, nrad + 1, nrad + 1))
    F4 = F4.at[:, :, gi[:, :, None], gi[:, None, :]].add(Fel)
    return F4[:, :, :nrad, :nrad]


def eval_fxc(funcs, g: DFTGridOps, Pa, Pb, nrad: int, thr: float = 1e-12):
    """XC Fock matrices and energy. Returns (Fxca, Fxcb, Exc, Nel).
    jit-compatible for a fixed functional list (close over `funcs`)."""
    nang = g.TT.shape[0]
    P4a = _pad_rad(_to4(Pa, nang, nrad))
    P4b = _pad_rad(_to4(Pb, nang, nrad))
    lapl = any(f.family == "mggal" for f in funcs)
    mgga = lapl or any(f.family == "mgga" for f in funcs)
    gga = mgga or any(f.family != "lda" for f in funcs)
    ra, ra_r, ra_t, ta, la = _density_fields(g, P4a, mgga, lapl)
    rb, rb_r, rb_t, tb, lb = _density_fields(g, P4b, mgga, lapl)
    saa = ra_r * ra_r + ra_t * ra_t
    sab = ra_r * rb_r + ra_t * rb_t
    sbb = rb_r * rb_r + rb_t * rb_t
    out = xc_eval(funcs, ra, rb, saa, sab, sbb, thr, ta=ta, tb=tb, la=la, lb=lb)
    vta = vtb = vla = vlb = None
    if lapl:
        e, vra, vrb, vsaa, vsab, vsbb, vta, vtb, vla, vlb = out
    elif mgga:
        e, vra, vrb, vsaa, vsab, vsbb, vta, vtb = out
    else:
        e, vra, vrb, vsaa, vsab, vsbb = out
    w = g.w2[:, :, None] * g.wth[None, None, :]
    Exc = jnp.sum(w * e)
    Nel = jnp.sum(w * (ra + rb))

    def fock_spin(vr, gr, gt, vt, vl):
        # LDA part: w vr chi_A chi_B
        A1 = jnp.einsum("eqt,abt->abeq", w * vr, g.TT)
        Fel = jnp.einsum("abeq,eqi,eqj->abeij", A1, g.bg, g.bg)
        if gga:
            # radial gradient part: w g_r (chi_A d_r chi_B + chi_B d_r chi_A)
            B1 = jnp.einsum("eqt,abt->abeq", w * gr, g.TT)
            rad = jnp.einsum("abeq,eqi,eqj->abeij", B1, g.dbg, g.bg)
            Fel = Fel + rad + jnp.swapaxes(jnp.swapaxes(rad, 0, 1), 3, 4)
            # theta gradient part: w g_t (1/r)(Theta_a Theta'_b + ...) b_i b_j
            C1 = jnp.einsum("eqt,abt->abeq", w * gt / g.r[:, :, None], g.dTT)
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", C1, g.bg, g.bg)
        if vt is not None:
            # 1/2 vtau grad(chi_A).grad(chi_B)
            T1 = jnp.einsum("eqt,abt->abeq", 0.5 * w * vt, g.TT)
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T1, g.dbg, g.dbg)
            T2 = jnp.einsum(
                "eqt,abt->abeq", 0.5 * w * vt / g.r[:, :, None] ** 2, g.dTT2 + g.TTm2
            )
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T2, g.bg, g.bg)
        if vl is not None:
            # vlapl grad^2(chi_A chi_B): radial second-derivative products
            # (symmetrized), the 2/r first-derivative term, and the angular
            # laplacian table
            L1 = jnp.einsum("eqt,abt->abeq", w * vl, g.TT)
            r2 = jnp.einsum("abeq,eqi,eqj->abeij", L1, g.d2bg, g.bg)
            Fel = Fel + r2 + jnp.swapaxes(jnp.swapaxes(r2, 0, 1), 3, 4)
            Fel = Fel + 2.0 * jnp.einsum("abeq,eqi,eqj->abeij", L1, g.dbg, g.dbg)
            L2 = jnp.einsum("eqt,abt->abeq", 2.0 * w * vl / g.r[:, :, None], g.TT)
            r1 = jnp.einsum("abeq,eqi,eqj->abeij", L2, g.dbg, g.bg)
            Fel = Fel + r1 + jnp.swapaxes(jnp.swapaxes(r1, 0, 1), 3, 4)
            L3 = jnp.einsum("eqt,abt->abeq", w * vl / g.r[:, :, None] ** 2, g.LTT)
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", L3, g.bg, g.bg)
        return Fel

    gra = 2.0 * vsaa * ra_r + vsab * rb_r
    gta = 2.0 * vsaa * ra_t + vsab * rb_t
    grb = 2.0 * vsbb * rb_r + vsab * ra_r
    gtb = 2.0 * vsbb * rb_t + vsab * ra_t

    Fa = _from4(_scatter_f(g, fock_spin(vra, gra, gta, vta, vla), nang, nrad), nang, nrad)
    Fb = _from4(_scatter_f(g, fock_spin(vrb, grb, gtb, vtb, vlb), nang, nrad), nang, nrad)
    return Fa, Fb, Exc, Nel


def eval_overlap_grid(g: DFTGridOps, nrad: int):
    """Overlap matrix via the XC grid -- the reference's grid-accuracy
    self-check (src/atomic/main.cpp:411-441)."""
    nang = g.TT.shape[0]
    w = g.w2[:, :, None] * g.wth[None, None, :]
    A1 = jnp.einsum("eqt,abt->abeq", w, g.TT)
    Sel = jnp.einsum("abeq,eqi,eqj->abeij", A1, g.bg, g.bg)
    return _from4(_scatter_f(g, Sel, nang, nrad), nang, nrad)


def eval_kinetic_grid(g: DFTGridOps, nrad: int):
    """Kinetic matrix via the grid: 1/2 int grad(chi_A).grad(chi_B) -- the
    second half of the reference's grid self-check, and a direct validation
    of the tau machinery."""
    nang = g.TT.shape[0]
    w = g.w2[:, :, None] * g.wth[None, None, :]
    T1 = jnp.einsum("eqt,abt->abeq", 0.5 * w, g.TT)
    Tel = jnp.einsum("abeq,eqi,eqj->abeij", T1, g.dbg, g.dbg)
    T2 = jnp.einsum("eqt,abt->abeq", 0.5 * w / g.r[:, :, None] ** 2, g.dTT2 + g.TTm2)
    Tel = Tel + jnp.einsum("abeq,eqi,eqj->abeij", T2, g.bg, g.bg)
    return _from4(_scatter_f(g, Tel, nang, nrad), nang, nrad)
