"""Quadrature rules (L0).

Host-side table builders in extended precision (numpy longdouble); results are
returned as float64 numpy arrays to be shipped to device as constants.

Capabilities mirrored from the reference:
  * Gauss-Lobatto nodes/weights for arbitrary n
    (reference: libhelfem/src/lobatto.cpp -- tabulated n=2..20 plus a
    Newton-iteration fallback; here a single Newton implementation in
    longdouble covers all n to ~1e-18).
  * Modified Gauss-Chebyshev rule of the second kind for int_{-1}^1 f(x) dx
    (Perez-Jorda et al.; reference: libhelfem/src/chebyshev.cpp:20-53).
  * Log-transformed radial Chebyshev rule
    (reference: libhelfem/src/chebyshev.cpp:55-77).
  * Compound angular rules (reference: src/general/angular.cpp): Gauss-Lobatto
    in cos(theta) x uniform phi.
"""

from functools import lru_cache

import numpy as np

__all__ = [
    "gauss_lobatto",
    "gauss_legendre",
    "chebyshev",
    "radial_chebyshev",
    "angular_lobatto",
]


def _legendre_and_deriv(n: int, x: np.ndarray):
    """P_n(x), P'_n(x), P''_n(x) via the three-term recurrence (longdouble)."""
    x = np.asarray(x, dtype=np.longdouble)
    p0 = np.ones_like(x)
    p1 = x.copy()
    if n == 0:
        return p0, np.zeros_like(x), np.zeros_like(x)
    for k in range(2, n + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    # P'_n = n (x P_n - P_{n-1}) / (x^2 - 1); safe since Lobatto Newton only
    # evaluates at interior points here.
    dp = n * (x * p1 - p0) / (x * x - 1.0)
    # Legendre ODE: (1-x^2) P'' - 2x P' + n(n+1) P = 0
    ddp = (2.0 * x * dp - n * (n + 1) * p1) / (1.0 - x * x)
    return p1, dp, ddp


@lru_cache(maxsize=None)
def gauss_lobatto(n: int):
    """n-point Gauss-Lobatto rule on [-1, 1].

    Returns (x, w) as float64 arrays; exact for polynomials of degree 2n-3.
    Interior nodes are the roots of P'_{n-1}; weights 2/(n(n-1) P_{n-1}(x)^2).
    """
    if n < 2:
        raise ValueError("Gauss-Lobatto rule needs at least 2 points")
    m = n - 1  # degree of P_m whose derivative's roots are the interior nodes
    x = np.empty(n, dtype=np.longdouble)
    x[0], x[-1] = -1.0, 1.0
    if n > 2:
        # Chebyshev-Lobatto initial guesses for interior nodes
        k = np.arange(1, n - 1, dtype=np.longdouble)
        xi = -np.cos(np.pi * k / m)
        for _ in range(100):
            _, dp, ddp = _legendre_and_deriv(m, xi)
            dx = dp / ddp
            xi = xi - dx
            if np.max(np.abs(dx)) < 1e-19:
                break
        x[1:-1] = xi
    # Evaluate P_{n-1} at all nodes (recurrence is fine at +-1)
    xl = x.astype(np.longdouble)
    p0 = np.ones_like(xl)
    p1 = xl.copy()
    for kk in range(2, m + 1):
        p0, p1 = p1, ((2 * kk - 1) * xl * p1 - (kk - 1) * p0) / kk
    pn1 = p1 if m >= 1 else p0
    w = 2.0 / (n * m * pn1 * pn1)
    return x.astype(np.float64), w.astype(np.float64)


@lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """n-point Gauss-Legendre rule on [-1, 1] (interior nodes only); used for
    the eta (cos nu) axis of the diatomic XC grid."""
    if n < 1:
        raise ValueError("need n >= 1")
    k = np.arange(1, n + 1, dtype=np.longdouble)
    x = np.cos(np.pi * (k - 0.25) / (n + 0.5))  # Tricomi initial guess
    for _ in range(100):
        p, dp, _ = _legendre_and_deriv(n, x)
        dx = p / dp
        x = x - dx
        if np.max(np.abs(dx)) < 1e-19:
            break
    p, dp, _ = _legendre_and_deriv(n, x)
    w = 2.0 / ((1.0 - x * x) * dp * dp)
    order = np.argsort(x)
    return x[order].astype(np.float64), w[order].astype(np.float64)


@lru_cache(maxsize=None)
def chebyshev(n: int):
    """Modified Gauss-Chebyshev rule of the second kind for \\int_{-1}^1 f dx.

    Analytic nodes/weights (Perez-Jorda, San-Fabian, Moscardo); matches the
    reference rule (libhelfem/src/chebyshev.cpp:22-53) including the
    ascending-x ordering. Built in longdouble, returned as f64.
    """
    i = np.arange(1, n + 1, dtype=np.longdouble)
    ang = i * np.longdouble(np.pi) / (n + 1)
    s = np.sin(ang)
    c = np.cos(ang)
    s2 = s * s
    w = (16.0 / 3.0 / (n + 1)) * s2 * s2
    x = 1.0 - 2.0 * i / (n + 1) + (2.0 / np.longdouble(np.pi)) * (1.0 + (2.0 / 3.0) * s2) * c * s
    # ascending order (reference reverses)
    return x[::-1].astype(np.float64).copy(), w[::-1].astype(np.float64).copy()


def radial_chebyshev(n: int):
    """Log-transformed radial rule r = log(2/(1-x))/log 2 on [0, inf).

    Total weight excludes the r^2 volume factor
    (reference: libhelfem/src/chebyshev.cpp:55-77).
    """
    x, w = chebyshev(n)
    xl = x.astype(np.longdouble)
    r = np.log(2.0 / (1.0 - xl)) / np.log(np.longdouble(2.0))
    jac = 1.0 / np.log(np.longdouble(2.0)) / (1.0 - xl)
    return r.astype(np.float64), (w * jac).astype(np.float64)


def angular_lobatto(lmax: int, mmax: int = 0):
    """Compound angular rule: (nth, nphi) product grid.

    Gauss-Lobatto rule with l+2 points in cos(theta) crossed with a uniform
    phi rule with 2*mmax+1 points per the reference convention
    (src/general/angular.cpp). Returns (cth, wth, phi, wphi).
    """
    nth = lmax + 2
    xl, wl = gauss_lobatto(nth)
    nphi = max(2 * mmax + 1, 1)
    phi = 2.0 * np.pi * np.arange(nphi) / nphi
    wphi = np.full(nphi, 2.0 * np.pi / nphi)
    return xl, wl, phi, wphi
