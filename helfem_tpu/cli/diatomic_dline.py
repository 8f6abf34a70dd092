"""`helfem-diatomic-dline`: electron density along the internuclear axis
from a diatomic checkpoint (reference: diatomic_dline,
src/diatomic/density_line.cpp)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-diatomic-dline", description=__doc__)
    p.add_argument("--load", required=True,
                   help="diatomic checkpoint: npz from this framework, or a "
                        "reference-schema HDF5 file (.chk/.h5/.hdf5), incl. "
                        "ones written by upstream HelFEM")
    p.add_argument("--output", default="density_line.dat")
    p.add_argument("--npts", type=int, default=200)
    p.add_argument("--zmax", type=float, default=0.0, help="0 = 3 Rhalf")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from helfem_tpu.models.diatomic_tools import density_line

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
    z, n = density_line(basis, P, npts=args.npts,
                        zmax=args.zmax if args.zmax > 0 else None)
    np.savetxt(args.output, np.column_stack([z, n]))
    print(f"density line ({args.npts} points) written to {args.output}")


if __name__ == "__main__":
    main()
