"""`helfem-harmonic`: 1D harmonic oscillator on FEM -- smoke test of the
L0-L2 layers (reference model: src/harmonic/main.cpp:17-137)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-harmonic", description=__doc__)
    p.add_argument("--xmax", type=float, default=10.0)
    p.add_argument("--nelem", type=int, default=12)
    p.add_argument("--nnodes", type=int, default=12)
    p.add_argument("--nquad", type=int, default=0)
    p.add_argument("--neig", type=int, default=10)
    p.add_argument("--omega", type=float, default=1.0)
    args = p.parse_args(argv)

    from helfem_tpu.ops.fem import FEMBasis
    from helfem_tpu.ops.polynomials import get_basis
    from helfem_tpu.ops.quadrature import chebyshev

    poly = get_basis(4, args.nnodes)
    fem = FEMBasis(poly, np.linspace(-args.xmax, args.xmax, args.nelem + 1))
    xq, wq = chebyshev(args.nquad or 5 * args.nnodes)
    S = fem.matrix_element(0, 0, xq, wq)
    T = 0.5 * fem.matrix_element(1, 1, xq, wq)
    V = 0.5 * args.omega**2 * fem.matrix_element(0, 0, xq, wq, f=fem.coords(xq) ** 2)
    w, U = np.linalg.eigh(S)
    Sinvh = U @ np.diag(w**-0.5) @ U.T
    E = np.linalg.eigvalsh(Sinvh @ (T + V) @ Sinvh)
    print(" n  E_FEM                 E_exact              error")
    for n in range(args.neig):
        exact = args.omega * (n + 0.5)
        print(f"{n:2d}  {E[n]: .15e} {exact: .15e} {E[n]-exact: .3e}")
    return E[: args.neig]


if __name__ == "__main__":
    main()
