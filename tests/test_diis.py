"""DIIS/ADIIS unit tests (reference: src/general/diis.cpp)."""

import numpy as np

from helfem_tpu.models.atomic import AtomicBasis
from helfem_tpu.scf.atomic_scf import scf_atom
from helfem_tpu.scf.diis import DIIS


def test_adiis_weights_simplex():
    """ADIIS weights live on the simplex and prefer the lowest-energy model."""
    rng = np.random.default_rng(0)
    n = 6
    S = np.eye(n)
    d = DIIS(S, S, diis_eps=0.1)
    # fabricate a history converging toward Fstar/Pstar
    Fstar = rng.standard_normal((n, n))
    Fstar = Fstar + Fstar.T
    Pstar = rng.standard_normal((n, n))
    Pstar = Pstar + Pstar.T
    for k in range(5):
        t = 2.0 ** (-k)
        dF = t * rng.standard_normal((n, n))
        dP = t * rng.standard_normal((n, n))
        d.update([Fstar + dF + dF.T], [Pstar + dP + dP.T])
    c = d._adiis_weights()
    assert abs(c.sum() - 1.0) < 1e-10
    assert np.all(c >= -1e-12)


def test_adiis_converges_hard_start():
    """Ne HF from the bare-core guess (very poor: err ~ Z) still converges
    with ADIIS weights steering the early iterations."""
    b = AtomicBasis(Z=10, lmax=1, mmax=1, rmax=40.0, nelem=8, nnodes=10)
    res = scf_atom(b, 5, 5, guess="core", convthr=1e-8, maxit=50)
    assert res.converged
    assert abs(res.E + 128.5470981) < 1e-5


def test_blockwise_error_matches_dense():
    """DIIS(blocks=...) computes the SAME error commutator blockwise when
    F/P/S are block-diagonal over the given symmetry blocks (the
    construction every blocked-eigensolve driver guarantees), up to the
    dropped exact-zero cross-block entries: the nonzero entries and hence
    the error norms and Gram matrix are identical."""
    rng = np.random.default_rng(1)
    sizes = [4, 3, 5]
    n = sum(sizes)
    blen = max(sizes)
    nblk = len(sizes)

    def blockdiag(mats):
        M = np.zeros((n, n))
        o = 0
        for m in mats:
            k = m.shape[0]
            M[o : o + k, o : o + k] = m
            o += k
        return M

    def spd(k):
        a = rng.standard_normal((k, k))
        return a @ a.T + k * np.eye(k)

    Sb = [spd(k) for k in sizes]
    Fb = [np.add(*(lambda a: (a, a.T))(rng.standard_normal((k, k)))) for k in sizes]
    Pb = [np.add(*(lambda a: (a, a.T))(rng.standard_normal((k, k)))) for k in sizes]
    S, F, P = blockdiag(Sb), blockdiag(Fb), blockdiag(Pb)

    from helfem_tpu.utils.linalg import form_sinvh

    Sinvh = blockdiag([form_sinvh(s) for s in Sb])
    blk_idx = np.full((nblk, blen), n, dtype=np.int32)
    blk_sinvh = np.zeros((nblk, blen, blen))
    o = 0
    for i, k in enumerate(sizes):
        blk_idx[i, :k] = np.arange(o, o + k)
        blk_sinvh[i, :k, :k] = form_sinvh(Sb[i])
        o += k

    dense = DIIS(S, Sinvh)
    blockw = DIIS(S, Sinvh, blocks=(blk_idx, blk_sinvh))
    e_dense = dense._error(F, P)
    e_block = blockw._error(F, P)
    # dense error is block-diagonal; compare block by block
    o = 0
    for i, k in enumerate(sizes):
        np.testing.assert_allclose(
            e_block[i, :k, :k], e_dense[o : o + k, o : o + k],
            rtol=0, atol=1e-12,
        )
        o += k
    # off-block dense entries are exact zeros (so the Gram products match)
    mask = np.zeros((n, n), dtype=bool)
    o = 0
    for k in sizes:
        mask[o : o + k, o : o + k] = True
        o += k
    assert np.abs(e_dense[~mask]).max() == 0.0
    assert abs(np.vdot(e_dense, e_dense) - np.vdot(e_block, e_block)) < 1e-12
