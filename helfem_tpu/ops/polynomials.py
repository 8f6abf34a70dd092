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
    noverlap: int = 1
    denom: np.ndarray = field(init=False)

    def left_dofs(self, deriv: bool = False):
        return [] if deriv else [0]

    def right_dofs(self, deriv: bool = False):
        return [] if deriv else [self.nprim - 1]

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=np.float64)
        nd = self.nodes.astype(LD)
        diff = nd[:, None] - nd[None, :]
        np.fill_diagonal(diff, 1.0)
        self.denom = np.prod(diff, axis=1)  # prod_{j!=i} (x_i - x_j)

    @property
    def nprim(self) -> int:
        return len(self.nodes)

    def eval(self, x: np.ndarray, nder: int = 0, element_length: float = 1.0) -> np.ndarray:
        """Values/derivatives of all basis functions at points x.

        Returns [nder+1, npts, nprim] float64 (derivatives w.r.t. the
        primitive coordinate x; element-length scaling is applied by the FEM
        layer; element_length is ignored for nodal bases).
        """
        x = np.asarray(x, dtype=np.float64)
        out = np.empty((nder + 1, len(x), self.nprim), dtype=LD)
        for i in range(self.nprim):
            roots = np.delete(self.nodes, i)
            out[:, :, i] = _prodpoly_eval(roots, x, nder) / self.denom[i]
        return out.astype(np.float64)

    def eval_div(self, x: np.ndarray, x0: float, nder: int = 0, element_length: float = 1.0) -> np.ndarray:
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


@dataclass
class LegendreBasis:
    """Spectral elements: Legendre-polynomial combinations with only the
    first/last function nonzero at the element edges, via a transformation
    matrix T (reference: libhelfem/src/LegendreBasis.{cpp,h}; shape functions
    of Flores, Clementi, Sonnad 1989)."""

    nnodes: int
    id: int = 3
    noverlap: int = 1
    T: np.ndarray = field(init=False)

    def __post_init__(self):
        lmax = self.nnodes - 1
        T = np.zeros((lmax + 1, lmax + 1))
        T[0, 0], T[1, 0] = 0.5, -0.5  # (P0-P1)/2
        T[0, lmax], T[1, lmax] = 0.5, 0.5  # (P0+P1)/2
        for j in range(1, lmax):
            sq = 1.0 / np.sqrt(4.0 * j + 2.0)
            T[j + 1, j] = sq
            T[j - 1, j] = -sq
        self.T = T

    @property
    def nprim(self) -> int:
        return self.nnodes

    def left_dofs(self, deriv: bool = False):
        return [0]

    def right_dofs(self, deriv: bool = False):
        return [self.nprim - 1]

    def _legendre_vals(self, x: np.ndarray, nder: int) -> np.ndarray:
        """P_l and derivatives [nder+1, npts, lmax+1] via the recurrences."""
        x = np.asarray(x, dtype=LD)
        L = self.nnodes - 1
        out = np.zeros((nder + 1, len(x), L + 1), dtype=LD)
        # values
        out[0, :, 0] = 1.0
        if L >= 1:
            out[0, :, 1] = x
        for l in range(1, L):
            out[0, :, l + 1] = ((2 * l + 1) * x * out[0, :, l] - l * out[0, :, l - 1]) / (l + 1)
        # derivatives via (2l+1) P_l = d/dx (P_{l+1} - P_{l-1})
        for d in range(1, nder + 1):
            for l in range(L + 1):
                # P_l^{(d)} = sum over recursion: use d/dx P_{l} = sum_{k} (2k+1) P_k (l-k odd)
                acc = np.zeros(len(x), dtype=LD)
                for k in range(l - 1, -1, -2):
                    acc += (2 * k + 1) * out[d - 1, :, k]
                out[d, :, l] = acc
        return out

    def eval(self, x: np.ndarray, nder: int = 0, element_length: float = 1.0) -> np.ndarray:
        v = self._legendre_vals(x, nder)
        return np.einsum("dqp,pf->dqf", v, self.T.astype(LD)).astype(np.float64)

    def eval_div(self, x: np.ndarray, x0: float, nder: int = 0, element_length: float = 1.0):
        return _generic_div(self.eval(x, nder), x, x0, nder)


@dataclass
class HIPBasis:
    """Hermite interpolating polynomials with nder continuous derivatives:
    (nder+1) DOFs per node (value, 1st..nder-th derivative), built as a
    transformation matrix T on an underlying LIP basis of (nder+1)*nnodes
    Gauss-Lobatto points (reference: libhelfem/src/GeneralHIPBasis.cpp:16-73;
    primbas 5 = nder 1, primbas 6..11 = nder 0..5).

    Derivative DOFs scale with the element length so global C^nder
    continuity holds across elements of different sizes
    (GeneralHIPBasis::scale_derivatives)."""

    nodes: np.ndarray  # [nnodes]
    nder: int = 1
    id: int = 5
    lip: LIPBasis = field(init=False)
    T: np.ndarray = field(init=False)

    def __post_init__(self):
        from helfem_tpu.ops.quadrature import gauss_lobatto

        self.nodes = np.asarray(self.nodes, dtype=np.float64)
        nfuncs = (self.nder + 1) * len(self.nodes)
        xl, _ = gauss_lobatto(nfuncs)
        self.lip = LIPBasis(nodes=xl)
        dfval = self.lip.eval(self.nodes, self.nder)  # [nder+1, nnodes, nfuncs]
        X = np.zeros((nfuncs, nfuncs))
        for inode in range(len(self.nodes)):
            for ider in range(self.nder + 1):
                X[:, (self.nder + 1) * inode + ider] = dfval[ider, inode, :]
        self.T = np.linalg.inv(X.T)

    @property
    def nprim(self) -> int:
        return (self.nder + 1) * len(self.nodes)

    @property
    def noverlap(self) -> int:
        return self.nder + 1

    @property
    def nnodes(self) -> int:
        return len(self.nodes)

    def left_dofs(self, deriv: bool = False):
        return list(range(1, self.nder + 1)) if deriv else [0]

    def right_dofs(self, deriv: bool = False):
        base = self.nprim - (self.nder + 1)
        return list(range(base + 1, self.nprim)) if deriv else [base]

    def _dof_scale(self, element_length: float) -> np.ndarray:
        s = np.ones(self.nprim)
        for inode in range(self.nnodes):
            for ider in range(1, self.nder + 1):
                s[(self.nder + 1) * inode + ider] = element_length**ider
        return s

    def eval(self, x: np.ndarray, nder: int = 0, element_length: float = 1.0) -> np.ndarray:
        v = self.lip.eval(x, nder)  # [nder+1, nq, nfuncs]
        out = np.einsum("dqp,pf->dqf", v, self.T)
        return out * self._dof_scale(element_length)[None, None, :]

    def eval_div(self, x: np.ndarray, x0: float, nder: int = 0, element_length: float = 1.0):
        return _generic_div(self.eval(x, nder, element_length), x, x0, nder)


def _generic_div(f: np.ndarray, x: np.ndarray, x0: float, nder: int) -> np.ndarray:
    """g = f/(x-x0) and derivatives via the quotient recurrence
    g^{(d)} = (f^{(d)} - d g^{(d-1)}) / (x-x0), in longdouble.

    Valid for functions with f(x0) = 0 (dropped-function columns give large
    values near x0 and must be masked by the caller, like LIPBasis.eval_div).
    """
    xr = np.asarray(x, dtype=LD) - LD(x0)
    safe = np.where(np.abs(xr) < 1e-300, 1.0, xr)
    fL = f.astype(LD)
    g = np.empty_like(fL)
    g[0] = fL[0] / safe[:, None]
    for d in range(1, nder + 1):
        g[d] = (fL[d] - d * g[d - 1]) / safe[:, None]
    return g.astype(np.float64)


def get_basis(primbas: int, nnodes: int):
    """Factory mirroring polynomial_basis::get_basis
    (libhelfem/src/PolynomialBasis.cpp:26-107):
      3  Legendre spectral elements
      4  LIP at Gauss-Lobatto nodes (default)
      5  HIP (value+derivative DOFs) at Gauss-Lobatto nodes
      6..11  general HIP with nder = id-6 continuous derivatives
      100/101  LIP/HIP at Chebyshev-Lobatto (extreme) nodes
               x_i = -cos(pi i/(n-1)), endpoints included
    """
    from helfem_tpu.ops.quadrature import gauss_lobatto

    if primbas == 3:
        return LegendreBasis(nnodes=nnodes, id=3)
    if primbas == 4:
        x, _ = gauss_lobatto(nnodes)
        return LIPBasis(nodes=x, id=4)
    if primbas == 5:
        x, _ = gauss_lobatto(nnodes)
        return HIPBasis(nodes=x, nder=1, id=5)
    if 6 <= primbas <= 11:
        x, _ = gauss_lobatto(nnodes)
        return HIPBasis(nodes=x, nder=primbas - 6, id=primbas)
    if primbas in (100, 101):
        i = np.arange(nnodes, dtype=LD)
        x = -np.cos(np.pi * i / LD(nnodes - 1))
        x[0], x[-1] = -1.0, 1.0
        if primbas == 100:
            return LIPBasis(nodes=x.astype(float), id=100)
        return HIPBasis(nodes=x.astype(float), nder=1, id=101)
    raise NotImplementedError(f"primbas={primbas} not implemented")
