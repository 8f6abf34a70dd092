"""`helfem-atomic-1e`: one-electron atom -- exact per-l spectra and radial
orbitals on the FEM basis (reference: src/sadatom/1e.cpp, the `1e_atom`
binary). Diagonalizes H_l = T + Z*V + l(l+1) T_l for each l <= lmax and
exports the eigenvalues, the orbital values on the radial quadrature grid,
and the grid itself (radii + weights) to a checkpoint -- the reference's
scriptable source of exact hydrogenic/finite-nucleus radial orbitals.

The finite-nucleus option shapes the element grid only (an nelem0 sub-grid
resolving the nuclear size), exactly like the reference program, which
also keeps the point-charge potential matrix (ref: src/sadatom/1e.cpp:97,
radial.nuclear() regardless of the model)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-atomic-1e", description=__doc__)
    p.add_argument("--Z", required=True, help="nuclear charge")
    p.add_argument("--Rmax", type=float, default=40.0)
    p.add_argument("--grid", type=int, default=4,
                   help="1 linear, 2 quadratic, 3 polynomial, 4 exponential")
    p.add_argument("--grid0", type=int, default=4,
                   help="finite-nucleus sub-grid type")
    p.add_argument("--zexp", type=float, default=2.0)
    p.add_argument("--zexp0", type=float, default=2.0)
    p.add_argument("--nelem", type=int, required=True)
    p.add_argument("--nelem0", type=int, default=0)
    p.add_argument("--lmax", type=int, default=3)
    p.add_argument("--nnodes", type=int, default=15)
    p.add_argument("--nquad", type=int, default=0)
    p.add_argument("--primbas", type=int, default=4)
    p.add_argument("--finitenuc", type=int, default=0,
                   help="0 point, 2 gaussian, 3 spherical, 4 hollow, "
                        "5 regularized")
    p.add_argument("--Rrms", type=float, default=0.0)
    p.add_argument("--neig", type=int, default=8,
                   help="eigenvalues printed per l (all are saved)")
    p.add_argument("--save", default="1e.chk",
                   help="checkpoint (.chk/.h5/.hdf5 -> HDF5, else npz) "
                        "holding orbs_<l>, E_<l>, r, wr")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.ops.fem import FEMBasis
    from helfem_tpu.ops.grids import form_grid
    from helfem_tpu.ops.polynomials import get_basis
    from helfem_tpu.ops.radial import RadialBasis
    from helfem_tpu.utils.elements import get_Z
    from helfem_tpu.utils.linalg import form_sinvh

    Z = get_Z(args.Z)
    nucmodel = {0: "point", 1: "point", 2: "gaussian", 3: "spherical",
                4: "hollow", 5: "regularized"}[args.finitenuc]
    nquad = args.nquad if args.nquad else 5 * args.nnodes
    poly = get_basis(args.primbas, args.nnodes)
    bval = form_grid(nucmodel, args.Rrms, args.nelem, args.Rmax, args.grid,
                     args.zexp, args.nelem0, args.grid0, args.zexp0, Z)
    fem = FEMBasis(poly, bval, drop_first=True, drop_last=True)
    rb = RadialBasis(fem, nquad)

    S = rb.overlap()
    Sinvh = form_sinvh(S)
    T = rb.kinetic()
    Tl = rb.kinetic_l()
    V = rb.nuclear()

    # grid radii and weights, element-stacked like the reference export
    radii = rb.r.ravel()
    weights = rb.wr.ravel()

    out = {"r": radii, "wr": weights}
    for l in range(args.lmax + 1):
        H = Sinvh.T @ (T + Z * V + l * (l + 1) * Tl) @ Sinvh
        E, Cw = np.linalg.eigh(0.5 * (H + H.T))
        C = Sinvh @ Cw
        # orbital values u_nl(r)/r on the quadrature grid (get_bf = B/r)
        Cpad = np.vstack([C, np.zeros((1, C.shape[1]))])
        orbs = np.concatenate(
            [rb.b[e] @ Cpad[fem.gidx[e]] for e in range(fem.nelem)], axis=0
        )
        out[f"E_{l}"] = E
        out[f"orbs_{l}"] = orbs
        nprint = min(args.neig, len(E))
        print(f"l={l} eigenvalues")
        for n in range(nprint):
            exact = -0.5 * Z * Z / (n + l + 1) ** 2
            print(f"  {E[n]: .12e}   (hydrogenic point-nucleus"
                  f" {exact: .6e})")

    if args.save.endswith((".chk", ".h5", ".hdf5")):
        import h5py

        from helfem_tpu.utils.checkpoint_h5 import _w_mat, _w_vec

        with h5py.File(args.save, "w") as f:
            _w_vec(f, "r", out["r"])
            _w_vec(f, "wr", out["wr"])
            for l in range(args.lmax + 1):
                _w_vec(f, f"E_{l}", out[f"E_{l}"])
                _w_mat(f, f"orbs_{l}", out[f"orbs_{l}"])
    else:
        np.savez(args.save, **out)
    print(f"saved {args.save}")
    return out


if __name__ == "__main__":
    main()
