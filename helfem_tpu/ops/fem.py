"""Finite-element basis layer (L2).

TPU-native redesign of FiniteElementBasis
(libhelfem/src/FiniteElementBasis.cpp, include/FiniteElementBasis.h):

* The reference drops the first/last basis function per boundary conditions by
  index surgery and loops over elements under OpenMP. Here every element keeps
  the full fixed [nprim] function slot layout; dropped functions have their
  basis-value columns ZEROED and their global index mapped to a trash slot
  (nbf). All per-element tensors have static shapes [nelem, nq, nprim] and the
  global assembly is one scatter-add -- XLA/TPU friendly and race-free by
  construction (replacing the per-element-buffer + serial reduction of
  FiniteElementBasis::matrix_element, FiniteElementBasis.cpp:327-349).

* Host-side table building in numpy f64 (from longdouble polynomial
  evaluation); device-side contraction helpers in jnp where needed per SCF
  iteration.
"""

from dataclasses import dataclass, field

import numpy as np

from helfem_tpu.ops.polynomials import LIPBasis

__all__ = ["FEMBasis"]


@dataclass
class FEMBasis:
    """Element partition + shape functions with boundary conditions.

    Global continuous functions: adjacent elements share one function
    (noverlap=1 for LIP). Global function g(e, i) = e*(nprim-1) + i, with the
    first (if drop_first) and last (if drop_last) global functions removed.
    """

    poly: LIPBasis
    bval: np.ndarray  # element boundaries [nelem+1]
    drop_first: bool = True
    drop_last: bool = True

    nelem: int = field(init=False)
    nprim: int = field(init=False)
    nbf: int = field(init=False)
    gidx: np.ndarray = field(init=False)  # [nelem, nprim] -> global index or nbf (trash)
    mask: np.ndarray = field(init=False)  # [nelem, nprim] 1.0 kept / 0.0 dropped

    def __post_init__(self):
        self.bval = np.asarray(self.bval, dtype=np.float64)
        self.nelem = len(self.bval) - 1
        self.nprim = self.poly.nprim
        nfull = self.nelem * (self.nprim - 1) + 1
        self.nbf = nfull - int(self.drop_first) - int(self.drop_last)

        e = np.arange(self.nelem)[:, None]
        i = np.arange(self.nprim)[None, :]
        g = e * (self.nprim - 1) + i - int(self.drop_first)
        dropped = (g < 0) | (g >= self.nbf)
        self.gidx = np.where(dropped, self.nbf, g).astype(np.int32)
        self.mask = np.where(dropped, 0.0, 1.0)

    # --- geometry -----------------------------------------------------------
    @property
    def lengths(self) -> np.ndarray:
        return self.bval[1:] - self.bval[:-1]

    @property
    def mids(self) -> np.ndarray:
        return 0.5 * (self.bval[1:] + self.bval[:-1])

    def coords(self, x: np.ndarray) -> np.ndarray:
        """Real coordinates r[e, q] for primitive points x[q] in every element."""
        return self.mids[:, None] + 0.5 * self.lengths[:, None] * np.asarray(x)[None, :]

    # --- evaluation ---------------------------------------------------------
    def eval_dnf(self, x: np.ndarray, nder: int = 0) -> np.ndarray:
        """Basis values/derivatives on the element-stacked grid.

        Returns [nder+1, nelem, nq, nprim]; derivative order k is scaled by
        (2/length_e)^k (chain rule of the x -> r map), dropped columns zeroed.
        (reference: PolynomialBasis::eval_dnf, PolynomialBasis.cpp:161-179)
        """
        vals = self.poly.eval(x, nder)  # [nder+1, nq, nprim]
        scale = (2.0 / self.lengths)[None, :, None, None] ** np.arange(nder + 1)[
            :, None, None, None
        ]
        out = vals[:, None, :, :] * scale
        return out * self.mask[None, :, None, :]

    # --- assembly -----------------------------------------------------------
    def assemble(self, elmat: np.ndarray) -> np.ndarray:
        """Scatter-add per-element matrices [..., nelem, nprim, nprim] into the
        global [..., nbf, nbf] matrix."""
        lead = elmat.shape[:-3]
        out = np.zeros(lead + (self.nbf + 1, self.nbf + 1), dtype=elmat.dtype)
        for e in range(self.nelem):
            ix = self.gidx[e]
            out[..., ix[:, None], ix[None, :]] += elmat[..., e, :, :]
        return out[..., : self.nbf, : self.nbf]

    def assemble_vec(self, elvec: np.ndarray) -> np.ndarray:
        """Scatter-add per-element vectors [..., nelem, nprim] -> [..., nbf]."""
        lead = elvec.shape[:-2]
        out = np.zeros(lead + (self.nbf + 1,), dtype=elvec.dtype)
        for e in range(self.nelem):
            out[..., self.gidx[e]] += elvec[..., e, :]
        return out[..., : self.nbf]

    def gather(self, mat: np.ndarray) -> np.ndarray:
        """Gather a global [..., nbf, nbf] matrix to element windows
        [..., nelem, nprim, nprim] (inverse of assemble; shared boundary
        entries are replicated into both adjacent elements)."""
        pad = np.zeros(mat.shape[:-2] + (self.nbf + 1, self.nbf + 1), dtype=mat.dtype)
        pad[..., : self.nbf, : self.nbf] = mat
        return pad[..., self.gidx[:, :, None], self.gidx[:, None, :]]

    def matrix_element(
        self,
        lhder: int,
        rhder: int,
        xq: np.ndarray,
        wq: np.ndarray,
        f: np.ndarray | None = None,
        lh_bf: np.ndarray | None = None,
        rh_bf: np.ndarray | None = None,
    ) -> np.ndarray:
        """Global matrix of <d^a u | f(r) | d^b v>.

        f is either None (=1) or values on the element grid [nelem, nq].
        lh_bf/rh_bf override the basis-value tensors [nelem, nq, nprim] (used
        by the radial layer to pass b=B/r functions).
        (reference: FiniteElementBasis::matrix_element,
        FiniteElementBasis.cpp:327-415)
        """
        if lh_bf is None or rh_bf is None:
            nder = max(lhder, rhder)
            dn = self.eval_dnf(xq, nder)
            if lh_bf is None:
                lh_bf = dn[lhder]
            if rh_bf is None:
                rh_bf = dn[rhder]
        w = wq[None, :] * (0.5 * self.lengths)[:, None]
        if f is not None:
            w = w * f
        elmat = np.einsum("eqi,eq,eqj->eij", lh_bf, w, rh_bf, optimize=True)
        return self.assemble(elmat)
