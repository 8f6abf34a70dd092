"""Range-separated (Yukawa) exchange tests."""

import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, exchange, rs_exchange
from helfem_tpu.ops.bessel import bessel_il, bessel_kl


def test_yukawa_kernel_identity():
    """4 pi lam sum_LM i_L(lam r<) k_L(lam r>) Y Y* == e^{-lam r12}/r12."""
    from helfem_tpu.ops.spherical import legendre_Pbar

    lam = 0.7
    pts = [((1.0, 0.2), (2.5, -0.6)), ((0.4, 0.9), (0.9, 0.3))]
    for (r1, c1), (r2, c2) in pts:
        # place both points in the xz plane (phi=0): cos gamma from angles
        s1, s2 = np.sqrt(1 - c1**2), np.sqrt(1 - c2**2)
        cosg = c1 * c2 + s1 * s2
        r12 = np.sqrt(r1**2 + r2**2 - 2 * r1 * r2 * cosg)
        Lmax = 60
        iv = bessel_il(np.array([lam * min(r1, r2)]), Lmax)[:, 0]
        kv = bessel_kl(np.array([lam * max(r1, r2)]), Lmax)[:, 0]
        # addition theorem: sum_L (2L+1) i_L k_L P_L(cos gamma) * lam
        from numpy.polynomial import legendre as LG

        tot = sum(
            lam * (2 * L + 1) * iv[L] * kv[L] * LG.legval(cosg, [0] * L + [1])
            for L in range(Lmax + 1)
        )
        exact = np.exp(-lam * r12) / r12
        assert abs(tot - exact) < 1e-12 * exact, (tot, exact)


def test_rs_exchange_coulomb_limit():
    """lambda -> 0: Yukawa exchange -> full Coulomb exchange."""
    b = AtomicBasis(Z=2, lmax=1, mmax=0, rmax=15.0, nelem=3, nnodes=6, nquad=40)
    ops = b.build_operators()
    rs = b.build_yukawa(1e-5)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((b.nbf, b.nbf)) * 0.1
    P = jnp.asarray(X + X.T)
    K = np.asarray(exchange(ops, P))
    Ky = np.asarray(rs_exchange(ops, rs, P))
    assert np.abs(K - Ky).max() < 1e-4 * max(1e-9, np.abs(K).max())


def test_rs_exchange_decays_with_lambda():
    """Larger screening -> smaller exchange magnitude, symmetric matrix."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=15.0, nelem=4, nnodes=6, nquad=40)
    ops = b.build_operators()
    rng = np.random.default_rng(1)
    X = rng.standard_normal((b.nbf, b.nbf)) * 0.1
    P = jnp.asarray(X @ X.T)
    prev = None
    for lam in [0.2, 1.0, 5.0]:
        rs = b.build_yukawa(lam)
        Ky = np.asarray(rs_exchange(ops, rs, P))
        assert np.abs(Ky - Ky.T).max() < 1e-11
        mag = np.abs(Ky).max()
        if prev is not None:
            assert mag < prev
        prev = mag


def test_erfc_exchange_coulomb_limit():
    """mu -> 0: erfc-attenuated exchange -> full Coulomb exchange; large mu
    -> vanishing."""
    from helfem_tpu.models.atomic import erfc_exchange

    b = AtomicBasis(Z=2, lmax=1, mmax=0, rmax=15.0, nelem=3, nnodes=6, nquad=40)
    ops = b.build_operators()
    rng = np.random.default_rng(0)
    X = rng.standard_normal((b.nbf, b.nbf)) * 0.1
    P = jnp.asarray(X + X.T)
    K = np.asarray(exchange(ops, P))
    rs = b.build_erfc(1e-5)
    Ke = np.asarray(erfc_exchange(ops, rs, P))
    # the in-element product quadrature across the r=r' kink limits the
    # mu->0 agreement to ~1e-3 (same algorithmic floor as the reference's
    # erfc path, which uses the identical 2D product rule)
    assert np.abs(K - Ke).max() < 5e-3 * np.abs(K).max()
    rs5 = b.build_erfc(5.0)
    Ke5 = np.asarray(erfc_exchange(ops, rs5, P))
    assert np.abs(Ke5).max() < 0.05 * np.abs(K).max()
    assert np.abs(Ke5 - Ke5.T).max() < 1e-11


def test_erfc_kernel_identity():
    """erfc(mu r12)/r12 == mu sum_L Phi_L(mu r<, mu r>) P_L(cos gamma) at
    small-argument points (the accurate branch)."""
    import math

    from numpy.polynomial import legendre as LG

    from helfem_tpu.ops.erfc_expn import phi_table

    mu = 0.3
    for (r1, c1), (r2, c2) in [((1.0, 0.2), (2.5, -0.6)), ((0.3, 0.9), (0.7, 0.3))]:
        s1, s2 = np.sqrt(1 - c1**2), np.sqrt(1 - c2**2)
        cosg = c1 * c2 + s1 * s2
        r12 = np.sqrt(r1**2 + r2**2 - 2 * r1 * r2 * cosg)
        Lmax = 50
        P = phi_table(Lmax, np.array([mu * max(r1, r2)]), np.array([mu * min(r1, r2)]))
        tot = sum(mu * P[L, 0] * LG.legval(cosg, [0] * L + [1]) for L in range(Lmax + 1))
        exact = math.erfc(mu * r12) / r12
        assert abs(tot - exact) < 1e-6 * exact
