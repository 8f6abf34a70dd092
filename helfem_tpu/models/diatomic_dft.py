"""Diatomic DFT quadrature grid and XC Fock build.

Redesign of src/diatomic/dftgrid.{cpp,h}: grid = (mu element x mu point) x
(eta Gauss-Legendre point), phi eliminated analytically (axial symmetry, like
the atomic grid). Volume weight Rh^3 (cosh^2 mu - eta^2) sinh mu, metric
h^2 = Rh^2 (cosh^2 mu - eta^2) for the gradient components

    u f = (1/h) df/dmu,     v f = (sqrt(1-eta^2)/h) df/deta.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.ops.quadrature import gauss_legendre
from helfem_tpu.ops.spherical import legendre_Pbar, ylm_dtheta
from helfem_tpu.ops.xc import xc_eval

__all__ = ["DiaGridOps", "build_dia_grid", "eval_fxc_dia", "eval_overlap_dia"]


class DiaGridOps(NamedTuple):
    Bg: jnp.ndarray  # [nelem, nq, nprim]
    dBg: jnp.ndarray
    w: jnp.ndarray  # [nelem, nq, nt] full volume weight (incl. 2 pi Rh^3)
    invh: jnp.ndarray  # [nelem, nq, nt] 1/h
    TT: jnp.ndarray  # [nang, nang, nt] Theta_a Theta_b delta_{ma mb}
    dTT: jnp.ndarray  # [nang, nang, nt] d/deta products
    dTT2: jnp.ndarray  # [nang, nang, nt] (1-eta^2) Theta'_a Theta'_b (tau)
    TTm2: jnp.ndarray  # [nang, nang, nt] m_a m_b Theta Theta / (1-eta^2) (tau)
    invhphi2: jnp.ndarray  # [nelem, nq] 1/(Rh^2 sinh^2 mu) (tau phi term)
    sqeta: jnp.ndarray  # [nt] sqrt(1 - eta^2)
    gidx: jnp.ndarray
    # laplacian meta-GGA path: nabla^2 chi = [B'' T + coth(mu) B' T
    #   - l(l+1) B T - m^2 B T / sinh^2 mu] / (Rh^2 (cosh^2 mu - eta^2))
    # (associated-Legendre ODE absorbs the eta second derivatives)
    d2Bg: jnp.ndarray  # [nelem, nq, nprim] d^2 B / dmu^2
    coth: jnp.ndarray  # [nelem, nq] coth(mu)
    inv_sh2: jnp.ndarray  # [nelem, nq] 1 / sinh^2 mu
    LLTT: jnp.ndarray  # [nang, nang, nt] (l_a(l_a+1) + l_b(l_b+1)) Theta products
    TTmm: jnp.ndarray  # [nang, nang, nt] 2 m_a m_b Theta products


def build_dia_grid(basis, neta: int = 0) -> DiaGridOps:
    lmax = int(basis.lval.max())
    if neta == 0:
        neta = 2 * lmax + 12
    eta, weta = gauss_legendre(neta)
    P = legendre_Pbar(lmax, eta)
    D = ylm_dtheta(lmax, eta)  # d/dtheta; d/deta = -D / sqrt(1-eta^2)
    sx = np.sqrt(1.0 - eta**2)
    nang = basis.nang
    Th = np.zeros((nang, neta))
    dTh = np.zeros((nang, neta))
    for a in range(nang):
        Th[a] = P[basis.lval[a], abs(basis.mval[a])]
        dTh[a] = -D[basis.lval[a], abs(basis.mval[a])] / sx
    same_m = (basis.mval[:, None] == basis.mval[None, :]).astype(np.float64)
    TT = same_m[:, :, None] * Th[:, None, :] * Th[None, :, :]
    dTT = same_m[:, :, None] * (dTh[:, None, :] * Th[None, :, :] + Th[:, None, :] * dTh[None, :, :])
    dTT2 = same_m[:, :, None] * (1.0 - eta**2)[None, None, :] * dTh[:, None, :] * dTh[None, :, :]
    mm = (basis.mval[:, None] * basis.mval[None, :]).astype(np.float64)
    TTm2 = same_m[:, :, None] * mm[:, :, None] * Th[:, None, :] * Th[None, :, :] / (1.0 - eta**2)[None, None, :]
    Rh = basis.Rhalf
    ch = np.cosh(basis.mu)
    sh = np.sinh(basis.mu)
    vol = ch[:, :, None] ** 2 - eta[None, None, :] ** 2
    w = 2.0 * np.pi * Rh**3 * basis.wmu[:, :, None] * sh[:, :, None] * vol * weta[None, None, :]
    invh = 1.0 / (Rh * np.sqrt(vol))
    ll = basis.lval * (basis.lval + 1.0)
    LLTT = (ll[:, None] + ll[None, :])[:, :, None] * TT
    TTmm = 2.0 * mm[:, :, None] * same_m[:, :, None] * Th[:, None, :] * Th[None, :, :]
    return DiaGridOps(
        Bg=jnp.asarray(basis.B),
        dBg=jnp.asarray(basis.dB),
        w=jnp.asarray(w),
        invh=jnp.asarray(invh),
        TT=jnp.asarray(TT),
        dTT=jnp.asarray(dTT),
        dTT2=jnp.asarray(dTT2),
        TTm2=jnp.asarray(TTm2),
        invhphi2=jnp.asarray(1.0 / (Rh**2 * sh**2)),
        sqeta=jnp.asarray(sx),
        gidx=jnp.asarray(basis.fem.gidx),
        d2Bg=jnp.asarray(basis.d2B),
        coth=jnp.asarray(ch / sh),
        inv_sh2=jnp.asarray(1.0 / sh**2),
        LLTT=jnp.asarray(LLTT),
        TTmm=jnp.asarray(TTmm),
    )


def _fields_dia(g: DiaGridOps, P4p: jnp.ndarray, need_tau: bool = False,
                need_lapl: bool = False):
    gi = g.gidx
    Pg = P4p[:, :, gi[:, :, None], gi[:, None, :]]
    D1 = jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.Bg, g.Bg)
    Dmu = 2.0 * jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.dBg, g.Bg)
    rho = jnp.einsum("abeq,abt->eqt", D1, g.TT)
    drho_u = jnp.einsum("abeq,abt->eqt", Dmu, g.TT) * g.invh
    drho_v = jnp.einsum("abeq,abt->eqt", D1, g.dTT) * (g.sqeta[None, None, :] * g.invh)
    tau = lapl = None
    if need_tau or need_lapl:
        Ddd = jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.dBg, g.dBg)
        tau = 0.5 * (
            jnp.einsum("abeq,abt->eqt", Ddd, g.TT) * g.invh**2
            + jnp.einsum("abeq,abt->eqt", D1, g.dTT2) * g.invh**2
            + jnp.einsum("abeq,abt->eqt", D1, g.TTm2) * g.invhphi2[:, :, None]
        )
    if need_lapl:
        # nabla^2 rho = sum_ab P_ab [chi_a nabla^2 chi_b + chi_b nabla^2
        # chi_a + 2 grad chi_a . grad chi_b]; the bracketed one-particle
        # laplacian factorizes via the associated-Legendre ODE (see
        # DiaGridOps docstring), and the gradient-dot term is 4 tau
        D2 = 2.0 * jnp.einsum("abeij,eqi,eqj->abeq", Pg, g.d2Bg, g.Bg)
        lapl = (
            jnp.einsum("abeq,abt->eqt", D2, g.TT)
            + jnp.einsum("abeq,abt->eqt", Dmu, g.TT) * g.coth[:, :, None]
            - jnp.einsum("abeq,abt->eqt", D1, g.LLTT)
            - jnp.einsum("abeq,abt->eqt", D1, g.TTmm) * g.inv_sh2[:, :, None]
        ) * g.invh**2 + 4.0 * tau
    return rho, drho_u, drho_v, tau, lapl


def eval_fxc_dia(funcs, g: DiaGridOps, ops, Pa, Pb, thr: float = 1e-12):
    """(Fxca, Fxcb, Exc, Nel) on the diatomic grid."""
    nang = g.TT.shape[0]
    nrad = ops.shellmask.shape[-1]

    def to4p(P):
        P4 = P.reshape(nang, nrad, nang, nrad).transpose(0, 2, 1, 3)
        return jnp.pad(P4, ((0, 0), (0, 0), (0, 1), (0, 1)))

    lapl = any(f.family == "mggal" for f in funcs)
    mgga = lapl or any(f.family == "mgga" for f in funcs)
    gga = mgga or any(f.family != "lda" for f in funcs)
    ra, ua, va, ta, la = _fields_dia(g, to4p(Pa), mgga, lapl)
    rb, ub, vb, tb, lb = _fields_dia(g, to4p(Pb), mgga, lapl)
    saa = ua * ua + va * va
    sab = ua * ub + va * vb
    sbb = ub * ub + vb * vb
    out = xc_eval(funcs, ra, rb, saa, sab, sbb, thr, ta=ta, tb=tb, la=la, lb=lb)
    vta = vtb = vla = vlb = None
    if lapl:
        e, vra, vrb, vsaa, vsab, vsbb, vta, vtb, vla, vlb = out
    elif mgga:
        e, vra, vrb, vsaa, vsab, vsbb, vta, vtb = out
    else:
        e, vra, vrb, vsaa, vsab, vsbb = out
    Exc = jnp.sum(g.w * e)
    Nel = jnp.sum(g.w * (ra + rb))

    def fock(vr, gu, gv, vt, vl):
        A1 = jnp.einsum("eqt,abt->abeq", g.w * vr, g.TT)
        Fel = jnp.einsum("abeq,eqi,eqj->abeij", A1, g.Bg, g.Bg)
        if gga:
            B1 = jnp.einsum("eqt,abt->abeq", g.w * gu * g.invh, g.TT)
            rad = jnp.einsum("abeq,eqi,eqj->abeij", B1, g.dBg, g.Bg)
            Fel = Fel + rad + jnp.swapaxes(jnp.swapaxes(rad, 0, 1), 3, 4)
            C1 = jnp.einsum(
                "eqt,abt->abeq", g.w * gv * g.invh * g.sqeta[None, None, :], g.dTT
            )
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", C1, g.Bg, g.Bg)
        if vt is not None:
            T1 = jnp.einsum("eqt,abt->abeq", 0.5 * g.w * vt * g.invh**2, g.TT)
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T1, g.dBg, g.dBg)
            T2 = jnp.einsum("eqt,abt->abeq", 0.5 * g.w * vt * g.invh**2, g.dTT2)
            T2 = T2 + jnp.einsum(
                "eqt,abt->abeq", 0.5 * g.w * vt * g.invhphi2[:, :, None], g.TTm2
            )
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T2, g.Bg, g.Bg)
        if vl is not None:
            # vlapl nabla^2(chi_A chi_B): one-particle laplacian pieces
            # (symmetrized in A/B) plus twice the gradient-dot terms
            wvl = g.w * vl * g.invh**2
            L1 = jnp.einsum("eqt,abt->abeq", wvl, g.TT)
            r2 = jnp.einsum("abeq,eqi,eqj->abeij", L1, g.d2Bg, g.Bg)
            Fel = Fel + r2 + jnp.swapaxes(jnp.swapaxes(r2, 0, 1), 3, 4)
            L1c = jnp.einsum("eqt,abt->abeq", wvl * g.coth[:, :, None], g.TT)
            r1 = jnp.einsum("abeq,eqi,eqj->abeij", L1c, g.dBg, g.Bg)
            Fel = Fel + r1 + jnp.swapaxes(jnp.swapaxes(r1, 0, 1), 3, 4)
            L2 = jnp.einsum("eqt,abt->abeq", wvl, g.LLTT)
            L2 = L2 + jnp.einsum(
                "eqt,abt->abeq", wvl * g.inv_sh2[:, :, None], g.TTmm
            )
            Fel = Fel - jnp.einsum("abeq,eqi,eqj->abeij", L2, g.Bg, g.Bg)
            # 2 grad(chi_A) . grad(chi_B) = 4 x the tau bilinears
            T1 = jnp.einsum("eqt,abt->abeq", 2.0 * g.w * vl * g.invh**2, g.TT)
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T1, g.dBg, g.dBg)
            T2 = jnp.einsum("eqt,abt->abeq", 2.0 * g.w * vl * g.invh**2, g.dTT2)
            T2 = T2 + jnp.einsum(
                "eqt,abt->abeq", 2.0 * g.w * vl * g.invhphi2[:, :, None], g.TTm2
            )
            Fel = Fel + jnp.einsum("abeq,eqi,eqj->abeij", T2, g.Bg, g.Bg)
        gi = g.gidx
        F4 = jnp.zeros((nang, nang, nrad + 1, nrad + 1))
        F4 = F4.at[:, :, gi[:, :, None], gi[:, None, :]].add(Fel)
        return F4[:, :, :nrad, :nrad].transpose(0, 2, 1, 3).reshape(nang * nrad, nang * nrad)

    gua = 2.0 * vsaa * ua + vsab * ub
    gva = 2.0 * vsaa * va + vsab * vb
    gub = 2.0 * vsbb * ub + vsab * ua
    gvb = 2.0 * vsbb * vb + vsab * va
    m2 = ops.shellmask.reshape(-1)
    Fa = fock(vra, gua, gva, vta, vla) * m2[:, None] * m2[None, :]
    Fb = fock(vrb, gub, gvb, vtb, vlb) * m2[:, None] * m2[None, :]
    return Fa, Fb, Exc, Nel


def eval_overlap_dia(g: DiaGridOps, nang: int, nrad: int):
    """Grid overlap for the accuracy self-check."""
    A1 = jnp.einsum("eqt,abt->abeq", g.w, g.TT)
    Sel = jnp.einsum("abeq,eqi,eqj->abeij", A1, g.Bg, g.Bg)
    gi = g.gidx
    S4 = jnp.zeros((nang, nang, nrad + 1, nrad + 1))
    S4 = S4.at[:, :, gi[:, :, None], gi[:, None, :]].add(Sel)
    return S4[:, :, :nrad, :nrad].transpose(0, 2, 1, 3).reshape(nang * nrad, nang * nrad)
