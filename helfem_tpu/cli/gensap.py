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
    p.add_argument("--primbas", type=int, default=4,
                   help="primitive polynomial basis id (3 Legendre, 4 LIP, 5 HIP, "
                        "6-11 general HIP, 100/101 Chebyshev nodes)")
    p.add_argument("--nquad", type=int, default=0,
                   help="quadrature points per element (0 = 5*nnodes)")
    p.add_argument("--maxit", type=int, default=128)
    p.add_argument("--convthr", type=float, default=1e-7)
    p.add_argument("--shift", type=float, default=1.0,
                   help="level shift for the initial SCF iterations, dropped "
                        "once the DIIS error is below 1e-3 (reference --shift, "
                        "src/sadatom/main.cpp:116)")
    p.add_argument("--method", default="lda_x", help="xc method for the SAP potential")
    p.add_argument("--iguess", type=int, default=3,
                   help="guess potential: 0 core, 1 GSZ, 2 SAP, 3 TF "
                        "(reference --iguess, src/sadatom/main.cpp:122; the "
                        "reference defaults to 2=SAP from its precomputed "
                        "table, but this build regenerates SAP potentials by "
                        "solving the same spherically-averaged atom, so the "
                        "default here is TF)")
    p.add_argument("--dftthr", type=float, default=1e-12,
                   help="density threshold for the xc evaluation")
    p.add_argument("--diisorder", type=int, default=10, help="DIIS history length")
    p.add_argument("--diiseps", type=float, default=0.1,
                   help="DIIS error below which extrapolation starts mixing in")
    p.add_argument("--diisthr", type=float, default=None,
                   help="DIIS error below which extrapolation is pure C2-DIIS "
                        "(unset = hard switch at diiseps)")
    p.add_argument("--restricted", type=int, default=None,
                   help="reference-style mode switch (src/sadatom/main.cpp:123): "
                        "1 restricted search, -1 unrestricted aufbau search, "
                        "0 unrestricted multiplicity scan; equivalent to the "
                        "--unrestricted/--scan switches below")
    p.add_argument("--zeroder", action="store_true",
                   help="zero derivative at Rmax (drops the Rmax derivative DOF "
                        "of Hermite bases; reference --zeroder)")
    p.add_argument("--taylor_order", type=int, default=-1,
                   help="accepted for reference parity; B(r)/r near the origin "
                        "is evaluated by exact (x - x0) polynomial division here "
                        "(ops/radial.py), so the Taylor-expansion order has no "
                        "effect")
    p.add_argument("--x_pars", default="", help="file of 'key=value' parameter "
                   "overrides for the exchange functional")
    p.add_argument("--c_pars", default="", help="same for the correlation functional")
    p.add_argument("--nosearch", action="store_true", help="skip occupation search")
    p.add_argument("--occs", default="auto",
                   help="'auto' (search), 'hf' (Saito 2009 table), or per-l "
                        "electron counts like '7,12,5,0'")
    p.add_argument("--output", default="", help="result_<El>.dat path (default auto)")
    p.add_argument("--unrestricted", action="store_true",
                   help="spin-polarized solve; writes resultU/M/W/S/s_<El>.dat variants")
    p.add_argument("--M", type=int, default=0, help="spin multiplicity 2S+1 (0 = auto)")
    p.add_argument("--scan", action="store_true",
                   help="with --unrestricted: full multiplicity scan (reference restricted=0)")
    p.add_argument("--Q", type=int, default=0, help="total charge")
    # finite nucleus + sub-grid (reference: main.cpp:104-110)
    p.add_argument("--finitenuc", default="point",
                   help="point|gaussian|spherical|hollow|regularized")
    p.add_argument("--Rrms", type=float, default=0.0, help="nuclear rms radius")
    p.add_argument("--nelem0", type=int, default=0, help="nuclear sub-grid elements")
    p.add_argument("--grid0", type=int, default=2)
    p.add_argument("--zexp0", type=float, default=2.0)
    # confinement (reference: main.cpp:138-143)
    p.add_argument("--iconf", type=int, default=0,
                   help="1 polynomial, 2 exponential, 3 barrier, 4 Junquera")
    p.add_argument("--conf_N", type=int, default=0)
    p.add_argument("--conf_R", type=float, default=0.0)
    p.add_argument("--conf_barrier", type=float, default=0.0)
    p.add_argument("--shift_conf", type=float, default=0.0)
    p.add_argument("--add_conf", action="store_true",
                   help="insert an element boundary at the confinement onset")
    # analysis outputs (reference: main.cpp:129-137)
    p.add_argument("--completeness", action="store_true",
                   help="write GTO/STO completeness + importance profiles")
    p.add_argument("--saveing", action="store_true",
                   help="write the xc-ingredient table xcing_<El>.dat")
    p.add_argument("--saveorb", action="store_true",
                   help="write radial orbital coefficients per l channel")
    p.add_argument("--savepot", action="store_true",
                   help="write the multiplicative xc potential to xcpot.dat "
                        "(reference: SCFSolver::XCPotential, main.cpp:666-668)")
    p.add_argument("--pot", default="none",
                   help="compute the exported result_<El>.dat potential with "
                        "THIS functional instead of the SCF one "
                        "(reference --pot, main.cpp:119,672-678)")
    p.add_argument("--vdwthr", type=float, default=1e-3,
                   help="density threshold for the van der Waals radius")
    p.add_argument("--eps_el", type=float, default=0.073416683704840394115,
                   help="electron count outside the electron-count radius "
                        "(default: H-atom value matching the 1e-3 vdW "
                        "threshold, Rahm 2016)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.models.sadatom import (
        SadAtomBasis,
        coulomb_screening,
        electron_count_radius,
        kinetic_energy_density,
        potential_table,
        radial_density,
        solve_sadatom,
        solve_sadatom_unrestricted,
        vdw_radius,
        xc_potential_table,
        xc_screening,
    )
    from helfem_tpu.ops.xc import parse_method
    from helfem_tpu.utils.elements import SYMBOLS, get_Z

    Z = get_Z(args.Z)
    if args.restricted is not None:
        # reference-style mode switch onto the --unrestricted/--scan pair
        args.unrestricted = args.restricted != 1
        args.scan = args.restricted == 0
    if args.x_pars or args.c_pars:
        from helfem_tpu.cli.atomic import _apply_pars_files

        args.method = _apply_pars_files(args.method, args.x_pars, args.c_pars)
    guess = {0: "core", 1: "GSZ", 2: "SAP", 3: "TF"}[args.iguess]
    solver_kw = dict(
        maxit=args.maxit, convthr=args.convthr, guess=guess, shift=args.shift,
        dftthr=args.dftthr, diisorder=args.diisorder, diiseps=args.diiseps,
        diisthr=args.diisthr,
    )
    basis = SadAtomBasis(
        Z=Z, lmax=args.lmax, rmax=args.Rmax, nelem=args.nelem,
        nnodes=args.nnodes, primbas=args.primbas, nquad=args.nquad,
        igrid=args.grid, zexp=args.zexp,
        finitenuc=args.finitenuc, Rrms=args.Rrms, nelem0=args.nelem0,
        igrid0=args.grid0, zexp0=args.zexp0,
        iconf=args.iconf, conf_N=args.conf_N, conf_R=args.conf_R,
        conf_barrier=args.conf_barrier, shift_conf=args.shift_conf,
        conf_boundary=args.shift_conf if (args.add_conf and args.iconf) else 0.0,
        zeroder=args.zeroder,
    )
    occs = None
    if args.occs == "hf":
        # Saito 2009 table occupations (reference: main.cpp:561-576 occs=hf)
        from helfem_tpu.models.sadconf import get_configuration

        conf = get_configuration(Z)
        if conf[args.lmax + 1 :].any():
            raise SystemExit(f"--occs hf for Z={Z} needs lmax >= 3")
        occs = conf[: args.lmax + 1]
        print(f"Saito 2009 occupations for {SYMBOLS[Z]}: {list(occs)}")
    elif args.occs != "auto":
        occs = np.array([int(x) for x in args.occs.replace(",", " ").split()])
    # spin-resolved occupations (reference: main.cpp:578-590 expects
    # 2*(lmax+1) entries when restricted=0/-1; restricted=-1 with lmax+1
    # entries goes through Hund's rules, translate_occs at main.cpp:87-95)
    occs_u = None
    if occs is not None and args.unrestricted:
        from helfem_tpu.models.sadconf import hund_rule

        if len(occs) == 2 * (args.lmax + 1):
            occs_u = (occs[: args.lmax + 1], occs[args.lmax + 1 :])
        elif len(occs) == args.lmax + 1:
            occs_u = hund_rule(occs)
            print("Used Hund's rules to translate occupations into "
                  f"{list(occs_u[0])} + {list(occs_u[1])}")
        else:
            raise SystemExit(f"--occs needs {args.lmax + 1} or "
                             f"{2 * (args.lmax + 1)} entries")
        occs = None
    elif occs is not None and len(occs) != args.lmax + 1:
        raise SystemExit(f"--occs needs {args.lmax + 1} entries")
    # --pot computes the exported screening with a DIFFERENT functional
    # than the SCF (reference: main.cpp:672-678)
    funcs, _ = parse_method(args.method)
    pot_funcs = funcs if args.pot == "none" else parse_method(args.pot)[0]
    if args.pot != "none":
        print(f"exported potential computed with {args.pot}")
    BOHR_A = 0.529177210903
    res = None
    if args.unrestricted and occs_u is not None:
        # fixed spin-resolved configuration: like the reference's
        # restricted=0 path with explicit occs, no restricted leg runs
        pass
    else:
        res = solve_sadatom(
            basis, nel=Z - args.Q, method=args.method,
            search=not args.nosearch, verbose=True, occs=occs, **solver_kw,
        )
        shells = "spdfgh"
        if res.conf_list and len(res.conf_list) > 1:
            # energy-ordered configuration list (reference: main.cpp:350-365)
            print(f"\nMinimal energy configurations for {SYMBOLS[Z]}")
            E0 = res.conf_list[0][1]
            for i, (key, E, conv) in enumerate(res.conf_list):
                occfmt = " ".join(f"{n:2d}" for n in key)
                line = f" {occfmt}  {E:+.10f}"
                if i > 0:
                    line += f" {(E - E0) * 27.211386245988:11.6f}"
                if not conv:
                    line += "  convergence failure"
                print(line)
        occstr = " ".join(f"{shells[l]}^{n}" for l, n in enumerate(res.occs) if n)
        print(f"\nConfiguration: {occstr}")
        # per-orbital <r^i> moments + density-maximum radius (reference:
        # OrbitalChannel::Print, src/sadatom/solver.cpp:152-186)
        from helfem_tpu.models.sadatom import occupied_orbital_table

        rows = occupied_orbital_table(basis, res.occs, res.orbE, res.orbs)
        hdr = f"{'nl':>3s} {'nocc':>4s} {'E':>16s}"
        for i in (-2, -1, 1, 2, 3):
            hdr += f" {'<r>(' + str(i) + ')':>12s}"
        print(hdr + f" {'r(max)':>12s}")
        for row in rows:
            line = (f"{row['n']:2d}{shells[row['l']]} {row['nocc']:4d} "
                    f"% 16.9f" % row["E"])
            for i in (-2, -1, 1, 2, 3):
                line += " %e" % row["moments"][i]
            print(line + " %e" % row["rmax"])
        Epot = res.E - res.Ekin - res.Ecoul - res.Exx - res.Exc
        Econf = 0.0
        if basis.Vconf is not None:
            Econf = float(np.sum(res.Pl.sum(axis=0) * np.asarray(basis.Vconf)))
        print(f"Etot  = % 18.9f" % res.E)
        print(f"Ekin  = % 18.9f" % res.Ekin)
        print(f"Ecoul = % 18.9f" % res.Ecoul)
        print(f"Eenuc = % 18.9f" % (Epot - Econf))
        if basis.Vconf is not None:
            print(f"Econf = % 18.9f" % Econf)
        print(f"Exc   = % 18.9f" % (res.Exx + res.Exc))

        Prad = res.Pl.sum(axis=0)
        # vdW + electron-count radii (reference: main.cpp:632-639)
        rvdw = vdw_radius(basis, Prad, args.vdwthr)
        print(f"\nEstimated vdW radius with density threshold {args.vdwthr:e} "
              f"is {rvdw:.6f} bohr = {rvdw * BOHR_A:.6f} A")
        print("Note that this criterion is sensitive to numerical noise.")
        rincl = electron_count_radius(basis, Prad, (Z - args.Q) - args.eps_el)
        print(f"Estimated vdW radius with electron count threshold "
              f"{args.eps_el:e} is {rincl:.6f} bohr = {rincl * BOHR_A:.6f} A")

        # SAP potential table (reference: RestrictedPotential 9-column format);
        r, n, dn, ln, wt = radial_density(basis, Prad)
        tau = kinetic_energy_density(basis, res.Pl)
        vcoul = coulomb_screening(basis, Prad)
        vxc = xc_screening(basis, Prad, pot_funcs)
        zeff = Z - (vcoul + vxc)
        out = np.column_stack([r, n, dn, ln, tau, vcoul, vxc, wt, zeff])
        order = np.argsort(r)
        path = args.output or f"result_{SYMBOLS[Z]}.dat"
        np.savetxt(path, out[order])
        print(f"SAP potential written to {path}")

        if args.savepot:
            # multiplicative xc potential table (reference: XCPotential ->
            # xcpot.dat, main.cpp:666-668); restricted spin densities are Pl/2
            rp, va, vb = xc_potential_table(basis, res.Pl / 2.0, res.Pl / 2.0, funcs)
            np.savetxt("xcpot.dat", np.column_stack([rp, va, vb]))
            print("xc potential written to xcpot.dat")

        if args.completeness:
            # GTO/STO completeness + importance profiles per l channel
            # (reference: gto/sto_{completeness,importance}_profile,
            # src/sadatom/solver.cpp; 501 exponents on [1e-5, 1e10])
            from helfem_tpu.ops.lcao import completeness_profile, importance_profile

            expn = np.logspace(-5, 10, 501)
            for kind in ("GTO", "STO"):
                comp = [np.log10(expn)]
                imp = [np.log10(expn)]
                for l in range(args.lmax + 1):
                    comp.append(completeness_profile(basis.rb, l, expn, kind))
                    # number of (partially) occupied orbitals: shell capacity
                    # is 2(2l+1) electrons per radial orbital
                    occn = int(np.ceil(res.occs[l] / (2.0 * (2 * l + 1))))
                    C_occ = np.asarray(res.orbs[l])[:, :occn]
                    imp.append(importance_profile(basis.rb, C_occ, l, expn, kind))
                np.savetxt(f"completeness_{kind}_{SYMBOLS[Z]}.dat", np.column_stack(comp))
                np.savetxt(f"importance_{kind}_{SYMBOLS[Z]}.dat", np.column_stack(imp))
                print(f"{kind} completeness + importance profiles written")

        if args.saveing:
            from helfem_tpu.models.sadatom import xc_ingredients

            ing = xc_ingredients(basis, res.Pl)
            iorder = np.argsort(ing[:, 0])
            np.savetxt(f"xcing_{SYMBOLS[Z]}.dat", ing[iorder])
            print(f"xc ingredients written to xcing_{SYMBOLS[Z]}.dat")

        if args.saveorb:
            for l in range(args.lmax + 1):
                np.savetxt(f"orbs_{SYMBOLS[Z]}_l{l}.dat", res.orbs[l])
            print("radial orbital coefficients written")

    if args.unrestricted:
        # spin-polarized solve + the five potential variants
        # (reference: src/sadatom/main.cpp:738-767)
        from helfem_tpu.models.sadatom import search_sadatom_unrestricted

        nel = Z - args.Q
        if occs_u is not None:
            # fixed spin-resolved configuration from --occs (reference:
            # restricted=0/-1 with explicit occupations, main.cpp:578-590,617-624)
            oa, ob = (np.asarray(o, dtype=int) for o in occs_u)
            r_u = solve_sadatom_unrestricted(
                basis, int(oa.sum()), int(ob.sum()), method=args.method,
                occs_a=oa, occs_b=ob, verbose=True, **solver_kw,
            )
            M = int(oa.sum() - ob.sum() + 1)
            if not r_u.converged:
                print("WARNING: unrestricted solve did not converge")
        elif args.M > 0:
            # fixed multiplicity: plain unrestricted solve with aufbau
            nela = (nel + args.M - 1) // 2
            nelb = nel - nela
            r_u = solve_sadatom_unrestricted(
                basis, nela, nelb, method=args.method, **solver_kw,
            )
            M = args.M
            if not r_u.converged:
                raise SystemExit("unrestricted solve did not converge")
        else:
            # configuration search (reference restricted=-1, or =0 with --scan)
            r_u = search_sadatom_unrestricted(
                basis, nel=nel, method=args.method,
                mode="scan" if args.scan else "aufbau", **solver_kw,
            )
            print(f"\nMinimal energy spin states for {SYMBOLS[Z]}")
            E0 = r_u.conf_list[0][1]
            for i, ((oa, ob), E, conv) in enumerate(r_u.conf_list):
                M_ = sum(oa) - sum(ob) + 1
                occfmt = " ".join(f"{n:2d}" for n in (*oa, *ob))
                line = f"{M_:2d}:  {occfmt}  {E:+.10f}"
                if i > 0:
                    line += f" {(E - E0) * 27.211386245988:11.6f}"
                if not conv:
                    line += "  convergence failure"
                print(line)
            M = int(sum(r_u.occs) - sum(r_u.occs_b) + 1)
        print(f"selected multiplicity {M}, E = {r_u.E:.9f}")
        # per-orbital analysis per spin channel (reference:
        # OrbitalChannel::Print for orbsa/orbsb, src/sadatom/solver.cpp)
        from helfem_tpu.models.sadatom import occupied_orbital_table

        shells_u = "spdfgh"
        for tag, occ_c, E_c, C_c in (("alpha", r_u.occs, r_u.orbE, r_u.orbs),
                                     ("beta", r_u.occs_b, r_u.orbE_b, r_u.orbs_b)):
            if occ_c is None or not np.asarray(occ_c).any():
                continue
            print(f"{tag} orbitals:")
            hdr = f"{'nl':>3s} {'nocc':>4s} {'E':>16s}"
            for i in (-2, -1, 1, 2, 3):
                hdr += f" {'<r>(' + str(i) + ')':>12s}"
            print(hdr + f" {'r(max)':>12s}")
            for row in occupied_orbital_table(basis, occ_c, E_c, C_c,
                                              restricted=False):
                line = (f"{row['n']:2d}{shells_u[row['l']]} {row['nocc']:4d} "
                        f"% 16.9f" % row["E"])
                for i in (-2, -1, 1, 2, 3):
                    line += " %e" % row["moments"][i]
                print(line + " %e" % row["rmax"])
        # radii of the spin-polarized ground state (reference: main.cpp:707-710)
        Prad_u = (r_u.Pl + r_u.Plb).sum(axis=0)
        rvdw_u = vdw_radius(basis, Prad_u, args.vdwthr)
        print(f"Estimated vdW radius with density threshold {args.vdwthr:e} "
              f"is {rvdw_u:.6f} bohr = {rvdw_u * BOHR_A:.6f} A")
        rincl_u = electron_count_radius(basis, Prad_u, nel - args.eps_el)
        print(f"Estimated vdW radius with electron count threshold "
              f"{args.eps_el:e} is {rincl_u:.6f} bohr = {rincl_u * BOHR_A:.6f} A")
        if args.savepot:
            rp, va, vb = xc_potential_table(basis, r_u.Pl, r_u.Plb, funcs)
            np.savetxt("xcpot.dat", np.column_stack([rp, va, vb]))
            print("xc potential written to xcpot.dat")
        for tag, mode in [("U", "mean"), ("M", "average"), ("W", "weighted"),
                          ("S", "highspin"), ("s", "lowspin")]:
            tab = potential_table(basis, r_u.Pl, r_u.Plb, pot_funcs, mode=mode)
            vpath = f"result{tag}_{SYMBOLS[Z]}.dat"
            np.savetxt(vpath, tab)
            print(f"{mode} potential written to {vpath}")
    return res if res is not None else r_u


if __name__ == "__main__":
    main()
