"""Atomic DFT quadrature grid and XC Fock build (L6).

Redesign of atomic::dftgrid (src/atomic/dftgrid.{cpp,h}):

* The reference evaluates complex basis functions chi, grad chi on a 3D
  (r, theta, phi) product grid per element under OpenMP with an even/odd
  element sweep to avoid write races. Here the phi dimension is ELIMINATED
  ANALYTICALLY: with the density matrix m-block-diagonal (always true under
  the axial/full symmetry the reference enforces, TwoDBasis::get_sym_idx),
  rho, grad rho and all XC matrix elements are phi-independent, and the
  angular factors reduce to REAL products of normalized associated Legendre
  functions Theta_a(theta) = Pbar_{l_a}^{|m_a|}(cos theta). The grid is
  (element, radial point, theta point), all contractions are batched einsums,
  and the global Fock assembly is one scatter-add (race-free by construction).

* XC energies/potentials from helfem_tpu.ops.xc (autodiff vrho/vsigma).

Grid layout per element e: points (q, t) with weight
    w[e,q,t] = wr[e,q] * r[e,q]^2 * wth[t] * 2*pi.
"""

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, AtomicOperators, _pad_rad, _to4, _from4
from helfem_tpu.ops.quadrature import gauss_lobatto
from helfem_tpu.ops.spherical import legendre_Pbar, ylm_dtheta
from helfem_tpu.ops.xc import xc_eval

__all__ = ["DFTGridOps", "build_dft_grid", "eval_fxc", "eval_overlap_grid"]


class DFTGridOps(NamedTuple):
    """Device constants for the XC grid."""

    bg: jnp.ndarray  # [nelem, nq, nprim] radial b values
    dbg: jnp.ndarray  # [nelem, nq, nprim] radial db/dr
    r: jnp.ndarray  # [nelem, nq]
    w2: jnp.ndarray  # [nelem, nq] radial weight incl. r^2 and 2 pi
    wth: jnp.ndarray  # [nt] theta weights (in cos theta)
    TT: jnp.ndarray  # [nang, nang, nt] Theta_a Theta_b * delta_{ma,mb}
    dTT: jnp.ndarray  # [nang, nang, nt] (Theta'_a Theta_b + Theta_a Theta'_b) * delta
    gidx: jnp.ndarray  # [nelem, nprim]


def build_dft_grid(basis: AtomicBasis, ntheta: int = 0) -> DFTGridOps:
    """Host-side grid constants. ntheta=0 -> 2*lmax + 12 Lobatto points in
    cos(theta) (integrates the <=4*lmax degree Legendre products exactly,
    mirroring the reference's ldft = 4*lmax + 10 default,
    src/atomic/main.cpp:389-396)."""
    if ntheta == 0:
        ntheta = 2 * basis.lmax + 12
    cth, wth = gauss_lobatto(ntheta)
    lmax = int(basis.lval.max())
    P = legendre_Pbar(lmax, cth)  # [l, m, nt]
    D = ylm_dtheta(lmax, cth)  # d/dtheta
    nang = basis.nang
    Th = np.zeros((nang, ntheta))
    dTh = np.zeros((nang, ntheta))
    for a in range(nang):
        Th[a] = P[basis.lval[a], abs(basis.mval[a])]
        dTh[a] = D[basis.lval[a], abs(basis.mval[a])]
    same_m = (basis.mval[:, None] == basis.mval[None, :]).astype(np.float64)
    TT = same_m[:, :, None] * Th[:, None, :] * Th[None, :, :]
    dTT = same_m[:, :, None] * (dTh[:, None, :] * Th[None, :, :] + Th[:, None, :] * dTh[None, :, :])
    rb = basis.rb
    return DFTGridOps(
        bg=jnp.asarray(rb.b),
        dbg=jnp.asarray(rb.db),
        r=jnp.asarray(rb.r),
        w2=jnp.asarray(rb.wr * rb.r**2 * 2.0 * np.pi),
        wth=jnp.asarray(wth),
        TT=jnp.asarray(TT),
        dTT=jnp.asarray(dTT),
        gidx=jnp.asarray(rb.fem.gidx),
    )


def _density_fields(g: DFTGridOps, P4p: jnp.ndarray):
    """rho, drho/dr, (1/r) drho/dtheta on the [e, q, t] grid from the padded
    4-index density."""
    gi = g.gidx
    Pg = P4p[:, :, gi[:, :, None], gi[:, None, :]]  # [a,b,e,i,j]
    D1 = jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.bg, g.bg)
    Ddr = 2.0 * jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.dbg, g.bg)
    rho = jnp.einsum("abeq,abt->eqt", D1, g.TT)
    drho_r = jnp.einsum("abeq,abt->eqt", Ddr, g.TT)
    drho_t = jnp.einsum("abeq,abt->eqt", D1, g.dTT) / g.r[:, :, None]
    return rho, drho_r, drho_t


def _scatter_f(g: DFTGridOps, Fel: jnp.ndarray, nang: int, nrad: int):
    gi = g.gidx
    F4 = jnp.zeros((nang, nang, nrad + 1, nrad + 1))
    F4 = F4.at[:, :, gi[:, :, None], gi[:, None, :]].add(Fel)
    return F4[:, :, :nrad, :nrad]


def eval_fxc(funcs, g: DFTGridOps, Pa, Pb, nrad: int, thr: float = 1e-12):
    """XC Fock matrices and energy.

    Returns (Fxca, Fxcb, Exc, Nel). jit-compatible for a fixed functional
    list (close over `funcs`)."""
    nang = g.TT.shape[0]
    P4a = _pad_rad(_to4(Pa, nang, nrad))
    P4b = _pad_rad(_to4(Pb, nang, nrad))
    ra, ra_r, ra_t = _density_fields(g, P4a)
    rb, rb_r, rb_t = _density_fields(g, P4b)
    saa = ra_r * ra_r + ra_t * ra_t
    sab = ra_r * rb_r + ra_t * rb_t
    sbb = rb_r * rb_r + rb_t * rb_t
    e, vra, vrb, vsaa, vsab, vsbb = xc_eval(funcs, ra, rb, saa, sab, sbb, thr)
    w = g.w2[:, :, None] * g.wth[None, None, :]
    Exc = jnp.sum(w * e)
    Nel = jnp.sum(w * (ra + rb))

    gga = any(f.family != "lda" for f in funcs)

    def fock_spin(vr, gr, gt):
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
        return Fel

    gra = 2.0 * vsaa * ra_r + vsab * rb_r
    gta = 2.0 * vsaa * ra_t + vsab * rb_t
    grb = 2.0 * vsbb * rb_r + vsab * ra_r
    gtb = 2.0 * vsbb * rb_t + vsab * ra_t

    Fa = _from4(_scatter_f(g, fock_spin(vra, gra, gta), nang, nrad), nang, nrad)
    Fb = _from4(_scatter_f(g, fock_spin(vrb, grb, gtb), nang, nrad), nang, nrad)
    return Fa, Fb, Exc, Nel


def eval_overlap_grid(g: DFTGridOps, nrad: int):
    """Overlap matrix via the XC grid -- the reference's grid-accuracy
    self-check (src/atomic/main.cpp:411-441)."""
    nang = g.TT.shape[0]
    w = g.w2[:, :, None] * g.wth[None, None, :]
    A1 = jnp.einsum("eqt,abt->abeq", w, g.TT)
    Sel = jnp.einsum("abeq,eqi,eqj->abeij", A1, g.bg, g.bg)
    return _from4(_scatter_f(g, Sel, nang, nrad), nang, nrad)
