"""`helfem-gensap`: spherically-averaged atoms + SAP potential generation
(flags mirror src/sadatom/main.cpp:101-143)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-gensap", description=__doc__)
    p.add_argument("--Z", required=True)
    p.add_argument("--lmax", type=int, default=3)
    p.add_argument("--Rmax", type=float, default=40.0)
    p.add_argument("--grid", type=int, default=4)
    p.add_argument("--zexp", type=float, default=2.0)
    p.add_argument("--nelem", type=int, default=10)
    p.add_argument("--nnodes", type=int, default=15)
    p.add_argument("--maxit", type=int, default=128)
    p.add_argument("--convthr", type=float, default=1e-7)
    p.add_argument("--method", default="lda_x", help="xc method for the SAP potential")
    p.add_argument("--nosearch", action="store_true", help="skip occupation search")
    p.add_argument("--output", default="", help="result_<El>.dat path (default auto)")
    p.add_argument("--unrestricted", action="store_true",
                   help="spin-polarized solve; writes resultU/M/W/S/s_<El>.dat variants")
    p.add_argument("--M", type=int, default=0, help="spin multiplicity 2S+1 (0 = auto)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.models.sadatom import (
        SadAtomBasis,
        coulomb_screening,
        kinetic_energy_density,
        potential_table,
        radial_density,
        solve_sadatom,
        solve_sadatom_unrestricted,
        xc_screening,
    )
    from helfem_tpu.ops.xc import parse_method
    from helfem_tpu.utils.elements import SYMBOLS, get_Z

    Z = get_Z(args.Z)
    basis = SadAtomBasis(
        Z=Z, lmax=args.lmax, rmax=args.Rmax, nelem=args.nelem,
        nnodes=args.nnodes, igrid=args.grid, zexp=args.zexp,
    )
    res = solve_sadatom(
        basis, method=args.method, maxit=args.maxit, convthr=args.convthr,
        search=not args.nosearch, verbose=True,
    )
    shells = "spdfgh"
    occstr = " ".join(f"{shells[l]}^{n}" for l, n in enumerate(res.occs) if n)
    print(f"\nConfiguration: {occstr}")
    print(f"Etot  = % 18.9f" % res.E)
    print(f"Ekin  = % 18.9f" % res.Ekin)
    print(f"Ecoul = % 18.9f" % res.Ecoul)
    print(f"Exc   = % 18.9f" % (res.Exx + res.Exc))

    # SAP potential table (reference: RestrictedPotential 9-column format)
    Prad = res.Pl.sum(axis=0)
    funcs, _ = parse_method(args.method)
    r, n, dn, ln, wt = radial_density(basis, Prad)
    tau = kinetic_energy_density(basis, res.Pl)
    vcoul = coulomb_screening(basis, Prad)
    vxc = xc_screening(basis, Prad, funcs)
    zeff = Z - (vcoul + vxc)
    out = np.column_stack([r, n, dn, ln, tau, vcoul, vxc, wt, zeff])
    order = np.argsort(r)
    path = args.output or f"result_{SYMBOLS[Z]}.dat"
    np.savetxt(path, out[order])
    print(f"SAP potential written to {path}")

    if args.unrestricted:
        # spin-polarized solve + the five potential variants
        # (reference: src/sadatom/main.cpp:738-767)
        if args.M > 0:
            mults = [args.M]
        else:
            # minimal-spin upward scan, same parity as the electron count
            m0 = 1 if Z % 2 == 0 else 2
            mults = [m for m in (m0, m0 + 2, m0 + 4) if m <= Z + 1]
        best = None
        for M in mults:
            nela = (Z + M - 1) // 2
            nelb = Z - nela
            r_u = solve_sadatom_unrestricted(
                basis, nela, nelb, method=args.method,
                maxit=args.maxit, convthr=args.convthr,
            )
            print(f"M = {M}: E = {r_u.E:.9f} (converged = {r_u.converged})")
            if r_u.converged and (best is None or r_u.E < best[1].E):
                best = (M, r_u)
        if best is None:
            raise SystemExit("unrestricted solve did not converge")
        M, r_u = best
        print(f"selected multiplicity {M}, E = {r_u.E:.9f}")
        for tag, mode in [("U", "mean"), ("M", "average"), ("W", "weighted"),
                          ("S", "highspin"), ("s", "lowspin")]:
            tab = potential_table(basis, r_u.Pl, r_u.Plb, funcs, mode=mode)
            vpath = f"result{tag}_{SYMBOLS[Z]}.dat"
            np.savetxt(vpath, tab)
            print(f"{mode} potential written to {vpath}")
    return res


if __name__ == "__main__":
    main()
