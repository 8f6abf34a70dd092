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
