"""Coulomb/exchange builds vs dense brute-force TEI contractions, plus
closed-form radial TEI checks (SURVEY.md stage-4 gates)."""

import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, coulomb, exchange
from helfem_tpu.utils.linalg import eig_gsym_lm


def dense_tei(b, ops):
    """Full (AB|CD) tensor from the same radial pieces (small bases only)."""
    nang, nrad, NL = b.nang, b.nrad, b.NL
    nelem = b.rb.fem.nelem
    gidx = b.rb.fem.gidx
    tei = np.asarray(ops.tei)
    U = np.asarray(ops.disjL)
    V = np.asarray(ops.disjm1L)
    R = np.zeros((NL, nrad + 1, nrad + 1, nrad + 1, nrad + 1))
    for L in range(NL):
        for e in range(nelem):
            ie = gidx[e]
            R[L][np.ix_(ie, ie, ie, ie)] += tei[L, e]
            for f in range(nelem):
                if f == e:
                    continue
                jf = gidx[f]
                blk = (
                    np.einsum("ij,kl->ijkl", U[L, e], V[L, f])
                    if e < f
                    else np.einsum("ij,kl->ijkl", V[L, e], U[L, f])
                )
                R[L][np.ix_(ie, ie, jf, jf)] += blk
    R = R[:, :nrad, :nrad, :nrad, :nrad]
    G = np.asarray(ops.G)
    Lfac = 4 * np.pi / (2 * np.arange(NL) + 1)
    dense = np.einsum("L,LMab,LMcd,LIJKP->aIbJcKdP", Lfac, G, G, R, optimize=True)
    nbf = nang * nrad
    return dense.reshape(nbf, nbf, nbf, nbf)


def test_jk_vs_dense():
    b = AtomicBasis(Z=2, lmax=1, mmax=0, rmax=15.0, nelem=3, nnodes=5, nquad=40)
    ops = b.build_operators()
    dense = dense_tei(b, ops)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((b.nbf, b.nbf))
    P = X + X.T
    Jd = np.einsum("ABCD,CD->AB", dense, P)
    Kd = -np.einsum("ABCD,AD->BC", dense, P)
    Jg = np.asarray(coulomb(ops, jnp.asarray(P)))
    Kg = np.asarray(exchange(ops, jnp.asarray(P)))
    assert np.abs(Jd - Jg).max() < 1e-12
    assert np.abs(Kd - Kg).max() < 1e-12
    assert np.abs(Jg - Jg.T).max() < 1e-12
    assert np.abs(Kg - Kg.T).max() < 1e-12


def test_1s_self_repulsion():
    """(1s 1s | 1s 1s) = 5 Z / 8 for the hydrogenic 1s orbital."""
    Z = 2
    b = AtomicBasis(Z=Z, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
    ops = b.build_operators()
    E, C = eig_gsym_lm(jnp.asarray(b.kinetic() + b.nuclear()), ops.Sinvh_rad)
    c = np.asarray(C)[0][:, 0]
    P = jnp.asarray(np.outer(c, c))
    val = float(jnp.vdot(P, coulomb(ops, P)))
    assert abs(val - 5 * Z / 8) < 1e-10
    # exchange of a single orbital with itself equals minus its self-repulsion
    assert abs(float(jnp.vdot(P, exchange(ops, P))) + 5 * Z / 8) < 1e-10


def test_exchange_bd_matches_dense():
    """The block-diagonal-density exchange (exchange_bd and the rs/erfc
    variants) must equal the dense channel-pair exchange for any density
    that is block-diagonal over angular channels -- the invariant the SCF
    relies on when running per-(l,m) symmetry blocks."""
    from helfem_tpu.models.atomic import (
        channel_diag,
        erfc_exchange,
        erfc_exchange_bd,
        exchange_bd,
        rs_exchange,
        rs_exchange_bd,
    )

    basis = AtomicBasis(Z=10, lmax=2, mmax=2, rmax=30.0, nelem=4, nnodes=6)
    ops = basis.build_operators()
    nang, nrad = basis.nang, basis.nrad
    rng = np.random.default_rng(7)
    P = np.zeros((basis.nbf, basis.nbf))
    for a in range(nang):
        B = rng.standard_normal((nrad, nrad))
        P[a * nrad : (a + 1) * nrad, a * nrad : (a + 1) * nrad] = B + B.T
    P = jnp.asarray(P)
    Pd = channel_diag(P, nang, nrad)

    K_dense = exchange(ops, P)
    K_bd = exchange_bd(ops, Pd)
    scale = float(jnp.max(jnp.abs(K_dense)))
    assert float(jnp.max(jnp.abs(K_dense - K_bd))) < 1e-13 * scale

    rs = basis.build_yukawa(0.8)
    K_dense = rs_exchange(ops, rs, P)
    K_bd = rs_exchange_bd(ops, rs, Pd)
    assert float(jnp.max(jnp.abs(K_dense - K_bd))) < 1e-13

    er = basis.build_erfc(0.5)
    K_dense = erfc_exchange(ops, er, P)
    K_bd = erfc_exchange_bd(ops, er, Pd)
    assert float(jnp.max(jnp.abs(K_dense - K_bd))) < 1e-13


def test_scf_bd_vs_dense_exchange():
    """Forcing m-blocks (symmetry=1, dense exchange path) and the default
    (l,m) blocks (bd exchange path) must converge to the same Ne HF energy."""
    from helfem_tpu.scf.atomic_scf import scf_atom

    basis = AtomicBasis(Z=10, lmax=1, mmax=1, rmax=30.0, nelem=5, nnodes=8)
    ops = basis.build_operators()
    r_bd = scf_atom(basis, 5, 5, convthr=1e-9, maxit=40, ops=ops)
    r_dn = scf_atom(basis, 5, 5, convthr=1e-9, maxit=40, ops=ops, symmetry=1)
    assert r_bd.converged and r_dn.converged
    assert abs(r_bd.E - r_dn.E) < 1e-9
