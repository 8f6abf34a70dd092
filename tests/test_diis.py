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
