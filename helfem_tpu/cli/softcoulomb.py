"""`helfem-softcoulomb`: 1D soft-Coulomb eigenproblem on FEM
(reference model: src/harmonic/softcoulomb.cpp)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-softcoulomb", description=__doc__)
    p.add_argument("--xmax", type=float, default=40.0)
    p.add_argument("--nelem", type=int, default=20)
    p.add_argument("--nnodes", type=int, default=12)
    p.add_argument("--nquad", type=int, default=0)
    p.add_argument("--neig", type=int, default=8)
    p.add_argument("--asoft", type=float, default=1.0, help="V = -1/sqrt(x^2+a^2)")
    args = p.parse_args(argv)

    from helfem_tpu.ops.fem import FEMBasis
    from helfem_tpu.ops.polynomials import get_basis
    from helfem_tpu.ops.quadrature import chebyshev

    poly = get_basis(4, args.nnodes)
    fem = FEMBasis(poly, np.linspace(-args.xmax, args.xmax, args.nelem + 1))
    xq, wq = chebyshev(args.nquad or 5 * args.nnodes)
    x = fem.coords(xq)
    S = fem.matrix_element(0, 0, xq, wq)
    T = 0.5 * fem.matrix_element(1, 1, xq, wq)
    V = fem.matrix_element(0, 0, xq, wq, f=-1.0 / np.sqrt(x**2 + args.asoft**2))
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    E = np.linalg.eigvalsh(Sinvh @ (T + V) @ Sinvh)
    print(" n  E")
    for n in range(args.neig):
        print(f"{n:2d}  {E[n]: .15e}")
    return E[: args.neig]


if __name__ == "__main__":
    main()
