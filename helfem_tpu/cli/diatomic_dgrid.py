"""`helfem-diatomic-dgrid`: electron density on a (z, rho) half-plane grid
from a diatomic checkpoint (reference: diatomic_dgrid,
src/diatomic/density_grid.cpp)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-diatomic-dgrid", description=__doc__)
    p.add_argument("--load", required=True,
                   help="diatomic checkpoint: npz from this framework, or a "
                        "reference-schema HDF5 file (.chk/.h5/.hdf5), incl. "
                        "ones written by upstream HelFEM")
    p.add_argument("--output", default="density_grid.dat")
    p.add_argument("--nz", type=int, default=100)
    p.add_argument("--nrho", type=int, default=50)
    p.add_argument("--zmax", type=float, default=0.0, help="0 = 3 Rhalf")
    p.add_argument("--rhomax", type=float, default=0.0, help="0 = 2 Rhalf")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from helfem_tpu.models.diatomic_tools import density_grid

    if args.load.endswith((".chk", ".h5", ".hdf5")):
        from helfem_tpu.utils.checkpoint_h5 import load_diatomic_chk_density

        basis, P = load_diatomic_chk_density(args.load)
    else:
        from helfem_tpu.scf.diatomic_scf import density_dia
        from helfem_tpu.utils.checkpoint import load_diatomic

        basis, d = load_diatomic(args.load)
        ops = basis.build_operators()
        P = np.asarray(density_dia(ops, jnp.asarray(d["orbs_a"]), jnp.asarray(d["occ_a"])))
        if d["orbs_b"].size:
            P = P + np.asarray(
                density_dia(ops, jnp.asarray(d["orbs_b"]), jnp.asarray(d["occ_b"]))
            )
        else:
            P = 2.0 * P
    z, rho, n = density_grid(
        basis, P, nz=args.nz, nrho=args.nrho,
        zmax=args.zmax if args.zmax > 0 else None,
        rhomax=args.rhomax if args.rhomax > 0 else None,
    )
    # rows: z rho n (the reference's whitespace .dat layout)
    Z, R = np.meshgrid(z, rho, indexing="ij")
    np.savetxt(args.output, np.column_stack([Z.ravel(), R.ravel(), n.ravel()]))
    print(f"density grid ({args.nz} x {args.nrho}) written to {args.output}")


if __name__ == "__main__":
    main()
