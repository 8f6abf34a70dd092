"""Radial element-boundary generators (L0).

Five grid families mirroring the reference (libhelfem/src/grid.cpp:18-88):
1 linear, 2 quadratic (Schweizer et al. 1999), 3 generalized polynomial
r_max*(i/n)^zexp, 4 generalized exponential, 5 geometric (Cances-Mourad 2018).
"""

import numpy as np

__all__ = ["get_grid"]


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
