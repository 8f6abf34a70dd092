"""`helfem-diatomic-1e`: one-electron diatomic (H2+-like) exact
diagonalization (reference: src/diatomic/1e.cpp)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-diatomic-1e", description=__doc__)
    p.add_argument("--Z1", required=True)
    p.add_argument("--Z2", required=True)
    p.add_argument("--Rbond", type=float, required=True)
    p.add_argument("--lmax", default="12")
    p.add_argument("--Rmax", type=float, default=40.0)
    p.add_argument("--nelem", type=int, default=6)
    p.add_argument("--nnodes", type=int, default=12)
    p.add_argument("--primbas", type=int, default=4)
    p.add_argument("--neig", type=int, default=8)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import eig_blocks_dia
    from helfem_tpu.utils.elements import get_Z

    lmax = tuple(int(x) for x in str(args.lmax).split(","))
    b = DiatomicBasis(
        Z1=get_Z(args.Z1), Z2=get_Z(args.Z2), Rbond=args.Rbond, lmax=lmax,
        rmax=args.Rmax, nelem=args.nelem, nnodes=args.nnodes, primbas=args.primbas,
    )
    ops = b.build_operators()
    E, C = eig_blocks_dia(ops, ops.H0)
    E = np.sort(np.asarray(E).ravel())
    Enucrep = b.Z1 * b.Z2 / b.Rbond
    print(" n  E_el                  E_el + Z1 Z2 / R")
    for n in range(args.neig):
        print(f"{n:2d}  {E[n]: .15e} {E[n]+Enucrep: .15e}")
    return E[: args.neig]


if __name__ == "__main__":
    main()
