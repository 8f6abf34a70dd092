"""Radial element-boundary generators (L0).

Five grid families mirroring the reference (libhelfem/src/grid.cpp:18-88):
1 linear, 2 quadratic (Schweizer et al. 1999), 3 generalized polynomial
r_max*(i/n)^zexp, 4 generalized exponential, 5 geometric (Cances-Mourad 2018).
"""

import numpy as np

__all__ = ["get_grid", "concatenate_grid", "form_grid"]


def get_grid(rmax: float, num_el: int, igrid: int = 4, zexp: float = 2.0) -> np.ndarray:
    """Element boundary values bval[0..num_el] with bval[0]=0, bval[-1]=rmax."""
    i = np.arange(num_el + 1, dtype=np.float64)
    if igrid == 1:
        bval = np.linspace(0.0, rmax, num_el + 1)
    elif igrid == 2:
        bval = i * i * rmax / (num_el * num_el)
    elif igrid == 3:
        bval = rmax * (i / num_el) ** zexp
    elif igrid == 4:
        bval = np.exp(np.linspace(0.0, np.log(rmax + 1.0) ** (1.0 / zexp), num_el + 1) ** zexp) - 1.0
    elif igrid == 5:
        if not (0.0 < zexp < 1.0):
            raise ValueError("geometric grid needs 0 < s < 1")
        hk = np.empty(num_el)
        hk[-1] = (1.0 - zexp) / (1.0 - zexp**num_el) * rmax
        for iel in range(num_el - 2, -1, -1):
            hk[iel] = zexp * hk[iel + 1]
        bval = np.concatenate([[0.0], np.cumsum(hk)])
    else:
        raise ValueError(f"invalid grid type {igrid}")
    bval[0] = 0.0
    bval[-1] = rmax
    return bval


def concatenate_grid(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Join two grids that both start at zero: the right grid is shifted to
    start at the left grid's end (reference: src/atomic/basis.cpp:36-51)."""
    if left[0] != 0.0 or right[0] != 0.0:
        raise ValueError("grids must start at zero")
    return np.concatenate([left, right[1:] + left[-1]])


def form_grid(
    model: str,
    Rrms: float,
    nelem: int,
    rmax: float,
    igrid: int = 4,
    zexp: float = 2.0,
    nelem0: int = 0,
    igrid0: int = 2,
    zexp0: float = 2.0,
    Z: int = 0,
    Zl: int = 0,
    Zr: int = 0,
    Rhalf: float = 0.0,
    add_boundary: float = 0.0,
) -> np.ndarray:
    """Atomic element grid with the reference's construction variants
    (src/atomic/basis.cpp:56-167):

    * finite nucleus (model != point/regularized, nelem0 > 0): an nelem0-
      element sub-grid resolving the nuclear charge radius r_nuc
      (hollow: Rrms, spherical: sqrt(5/3) Rrms, gaussian: 3 Rrms), doubled
      to [0, 2 r_nuc], then the nelem-element electronic grid
      (basis.cpp:56-68).
    * off-center nuclei (Zl or Zr nonzero, nelem0 > 0): element boundaries
      at b0 = Z Rhalf/(Z + max(Zl,Zr)) and at Rhalf, with the [b0, Rhalf]
      section reversed so spacing tightens toward the off-center nucleus
      (basis.cpp:70-117).
    * confinement boundary (add_boundary > 0): insert an element boundary
      exactly at the confinement onset radius (basis.cpp:152-167).
    """
    if model not in ("point", "regularized") and nelem0 > 0:
        if Zl or Zr:
            raise ValueError("off-center nuclei not supported with a finite nucleus")
        if model == "hollow":
            rnuc = Rrms
        elif model == "spherical":
            rnuc = np.sqrt(5.0 / 3.0) * Rrms
        elif model == "gaussian":
            rnuc = 3.0 * Rrms
        else:
            raise ValueError(f"nuclear grid not handled for model {model}")
        bnuc = get_grid(rnuc, nelem0, igrid0, zexp0)
        belec = get_grid(rmax - rnuc, nelem, igrid, zexp)
        bval = concatenate_grid(concatenate_grid(bnuc, bnuc), belec)
    elif (Zl != 0 or Zr != 0) and nelem0 > 0:
        b0 = Z * Rhalf / (Z + max(Zl, Zr)) if Z != 0 else 0.0
        parts = []
        if Z != 0:
            parts.append(get_grid(b0, nelem0, igrid, zexp))
        # reversed grid on [b0, Rhalf]: tighter spacing at the nucleus
        rev = get_grid(Rhalf - b0, nelem0, igrid, zexp)
        rev = (Rhalf - b0) - rev[::-1]
        rev[0], rev[-1] = 0.0, Rhalf - b0
        parts.append(rev)
        parts.append(get_grid(rmax - Rhalf, nelem, igrid, zexp))
        bval = parts[0]
        for p in parts[1:]:
            bval = concatenate_grid(bval, p)
    else:
        bval = get_grid(rmax, nelem, igrid, zexp)
    if add_boundary > 0.0 and not np.any(bval == add_boundary):
        bval = np.sort(np.append(bval, add_boundary))
    return bval
