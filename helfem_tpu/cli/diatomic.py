"""`helfem-diatomic`: diatomic HF/DFT SCF driver CLI
(flags mirror src/diatomic/main.cpp:89-143)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-diatomic", description=__doc__)
    p.add_argument("--Z1", required=True)
    p.add_argument("--Z2", required=True)
    p.add_argument("--Rbond", type=float, required=True)
    p.add_argument("--angstrom", action="store_true")
    p.add_argument("--nela", type=int, default=0)
    p.add_argument("--nelb", type=int, default=0)
    p.add_argument("--Q", type=int, default=0)
    p.add_argument("--M", type=int, default=0)
    p.add_argument("--lmax", required=True, help="lmax, or comma list per |m|")
    p.add_argument("--mmax", type=int, default=-1,
                   help="maximum m quantum number; if >= 0, --lmax must be a "
                        "single value applied to every |m| <= mmax "
                        "(reference --mmax, src/diatomic/main.cpp:98,256-259)")
    p.add_argument("--lpad", type=int, default=10,
                   help="accepted for reference parity (Qlm recursion padding, "
                        "src/diatomic/main.cpp:99); the Q_lm builder here pads "
                        "the Miller downward recursion automatically per point "
                        "(ops/legendreq.py), so it has no effect")
    p.add_argument("--Rmax", type=float, default=40.0)
    p.add_argument("--grid", type=int, default=4)
    p.add_argument("--zexp", type=float, default=2.0)
    p.add_argument("--nelem", type=int, required=True)
    p.add_argument("--nnodes", type=int, default=15)
    p.add_argument("--primbas", type=int, default=4,
                   help="primitive polynomial basis id (3 Legendre, 4 LIP, 5 HIP, "
                        "6-11 general HIP, 100/101 Chebyshev nodes)")
    p.add_argument("--nquad", type=int, default=0)
    p.add_argument("--maxit", type=int, default=50)
    p.add_argument("--convthr", type=float, default=1e-7)
    p.add_argument("--method", default="HF")
    p.add_argument("--guess", default="core", help="core|SAP|TF|GSZ")
    p.add_argument("--iguess", type=int, default=None,
                   help="guess by reference id: 0 core, 1 GSZ, 2 SAP, 3 TF "
                        "(overrides --guess; src/diatomic/main.cpp:128)")
    p.add_argument("--diag", type=int, default=1,
                   help="1: symmetric-eigendecomposition whitening (exact "
                        "diagonalization); 0: inverse-Cholesky whitening "
                        "(reference --diag, src/diatomic/main.cpp:111)")
    p.add_argument("--maverage", action="store_true",
                   help="average the Fock matrix over +-m symmetry pairs "
                        "every iteration (reference --maverage, "
                        "src/diatomic/main.cpp:133,892-895)")
    p.add_argument("--save", default="", help="write a checkpoint; a "
                   ".chk/.h5/.hdf5 extension writes the reference HDF5 schema, "
                   "anything else npz")
    p.add_argument("--load", default="", help="warm start from a checkpoint "
                   "(npz or reference-schema HDF5 by extension)")
    p.add_argument("--Ez", type=float, default=0.0, help="electric field along the bond")
    p.add_argument("--Qzz", type=float, default=0.0, help="quadrupole field strength")
    p.add_argument("--Bz", type=float, default=0.0, help="magnetic field along the bond")
    p.add_argument("--restricted", type=int, default=-1,
                   help="-1 auto, 0 unrestricted, 1 restricted (ROHF if open shell)")
    p.add_argument("--symmetry", type=int, default=-1,
                   help="force orbital symmetry (reference --symmetry, "
                        "src/diatomic/main.cpp:120): 0/1 m blocks only, "
                        "2 add gerade/ungerade; -1 auto (g/u for homonuclear "
                        "without an axial electric field)")
    p.add_argument("--perturb", type=float, default=0.0,
                   help="random orthogonal rotation amplitude for the guess orbitals")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diisorder", type=int, default=10, help="DIIS history length")
    p.add_argument("--diiseps", type=float, default=0.1,
                   help="DIIS error below which extrapolation starts mixing in")
    p.add_argument("--diisthr", type=float, default=None,
                   help="DIIS error below which extrapolation is pure C2-DIIS; "
                        "between diisthr and diiseps the DIIS/ADIIS weights are "
                        "blended on the reference's sliding scale "
                        "(src/general/diis.cpp:241); unset = hard switch at diiseps")
    p.add_argument("--dftthr", type=float, default=1e-12)
    p.add_argument("--ldft", type=int, default=0,
                   help="eta rule order for the dft grid (0 = auto)")
    p.add_argument("--mdft", type=int, default=0,
                   help="accepted for reference parity; the phi integral is "
                        "evaluated analytically here, so it has no effect")
    p.add_argument("--readocc", type=int, default=0,
                   help="read per-symmetry-block occupations from occs.dat "
                        "(lines 'na nb'), used until this iteration (<0: always)")
    p.add_argument("--x_pars", default="", help="file of 'key=value' parameter "
                   "overrides for the exchange functional")
    p.add_argument("--c_pars", default="", help="same for the correlation functional")
    p.add_argument("--finitenuc", default="point",
                   help="nuclear model: point|gaussian|spherical|hollow|regularized")
    p.add_argument("--trace", default="",
                   help="write a jax.profiler device/XLA trace of the SCF to "
                        "this directory (TensorBoard/Perfetto format)")
    p.add_argument("--Rrms1", type=float, default=0.0, help="nucleus 1 rms radius")
    p.add_argument("--Rrms2", type=float, default=0.0, help="nucleus 2 rms radius")
    p.add_argument("--ndev", type=int, default=0,
                   help="run the SCF over an N-device mesh: the Coulomb (L,M) "
                        "channel scan, the exchange (L,|M|) step scan, and the "
                        "XC mu-element axis shard over the mesh; the blocked "
                        "eigensolve shards the symmetry-block axis (the "
                        "multi-chip replacement for the reference's OpenMP, "
                        "src/diatomic/basis.cpp:1560)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.cli.atomic import parse_nela_nelb
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import scf_diatomic
    from helfem_tpu.utils.elements import ANGSTROM_IN_BOHR, get_Z

    Z1, Z2 = get_Z(args.Z1), get_Z(args.Z2)
    R = args.Rbond * (ANGSTROM_IN_BOHR if args.angstrom else 1.0)
    if args.mmax >= 0:
        # single lmax applied to every |m| <= mmax (reference --mmax,
        # src/diatomic/main.cpp:256-259)
        if "," in str(args.lmax):
            raise SystemExit("--mmax requires a single --lmax value")
        lmax = (int(args.lmax),) * (args.mmax + 1)
    else:
        lmax = tuple(int(x) for x in str(args.lmax).split(","))
    if args.iguess is not None:
        args.guess = {0: "core", 1: "GSZ", 2: "SAP", 3: "TF"}[args.iguess]
    nela, nelb = parse_nela_nelb(Z1 + Z2, args.Q, args.M, args.nela, args.nelb)
    if args.x_pars or args.c_pars:
        from helfem_tpu.cli.atomic import _apply_pars_files

        args.method = _apply_pars_files(args.method, args.x_pars, args.c_pars)
    occs = None
    if args.readocc:
        import numpy as np

        occs = np.loadtxt("occs.dat", ndmin=2)
        if occs.shape[1] < 2:
            raise SystemExit("occs.dat needs at least two columns (na nb)")

    basis = DiatomicBasis(
        Z1=Z1, Z2=Z2, Rbond=R, lmax=lmax, rmax=args.Rmax, nelem=args.nelem,
        nnodes=args.nnodes, primbas=args.primbas, nquad=args.nquad, igrid=args.grid, zexp=args.zexp,
    )
    print(f"Running {args.method} on Z1={Z1} Z2={Z2} R={R} with {nela}+{nelb} electrons")
    print(f"{basis.nang} angular shells x {basis.nrad} radial functions; "
          f"{len(basis.lm_map)} (L,|M|) channels")
    # symmetry blocking: auto uses g/u for homonuclear without an axial
    # field; --symmetry 2 forces g/u (relaxed with a warning under fields,
    # like the reference, src/diatomic/main.cpp:313-319); 0/1 force m-only
    parity = args.Ez == 0.0
    if args.symmetry in (0, 1):
        parity = False
    elif args.symmetry == 2:
        if args.Ez != 0.0:
            print("Warning - asked for full orbital symmetry in presence of "
                  "electric field. Relaxing restriction.")
        else:
            parity = True
    ops = basis.build_operators(parity=parity, chol=not args.diag)
    P0a = P0b = None
    if args.load and args.load.endswith((".chk", ".h5", ".hdf5")):
        # reference-schema HDF5 checkpoint (interoperable with upstream
        # HelFEM --save files; utils/checkpoint_h5.py)
        from helfem_tpu.utils.checkpoint_h5 import (
            load_diatomic_chk,
            warm_start_density_dia_h5,
        )

        bold, d = load_diatomic_chk(args.load)
        P0a, P0b = warm_start_density_dia_h5(basis, bold, d)
        print(f"warm start from HDF5 checkpoint {args.load}")
    elif args.load:
        import jax.numpy as jnp
        import numpy as np

        from helfem_tpu.scf.diatomic_scf import density_dia
        from helfem_tpu.utils.checkpoint import load_diatomic

        bold, d = load_diatomic(args.load)
        if bold.nbf == basis.nbf and bold.lmax == basis.lmax:
            ops0 = ops
            P0a = np.asarray(density_dia(ops0, jnp.asarray(d["orbs_a"]), jnp.asarray(d["occ_a"])))
            if d["orbs_b"].size:
                P0b = np.asarray(density_dia(ops0, jnp.asarray(d["orbs_b"]), jnp.asarray(d["occ_b"])))
            print(f"warm start from {args.load} (E = {float(d['E']):.9f})")
        else:
            # different discretization: cross-basis restart projection
            # (reference: src/diatomic/main.cpp --load with interpolation)
            from helfem_tpu.utils.checkpoint import warm_start_density_dia

            P0a, P0b = warm_start_density_dia(basis, bold, d)
            print(f"cross-basis warm start from {args.load} (E = {float(d['E']):.9f})")
    # crash-recovery checkpoint: write the current state every host pass
    # (reference: per-iteration HDF5 checkpoint, src/diatomic/main.cpp)
    from types import SimpleNamespace

    from helfem_tpu.utils.checkpoint import save_diatomic as _save_dia

    def save_cb(it, Etot, Ea, Ca, occa, Eb, Cb, occb):
        import numpy as _np

        st = SimpleNamespace(
            converged=False, E=Etot,
            orbE_a=_np.sort(_np.asarray(Ea).ravel()), orbs_a=_np.asarray(Ca),
            occ_a=occa,
            orbE_b=None if Eb is None else _np.sort(_np.asarray(Eb).ravel()),
            orbs_b=None if Cb is None else _np.asarray(Cb),
            occ_b=occb,
        )
        # crash-recovery writes stay npz; keep them out of an HDF5 --save
        # target (the reference-schema file is written once at the end)
        crash_path = args.save
        if crash_path.endswith((".chk", ".h5", ".hdf5")):
            crash_path += ".crash.npz"
        _save_dia(crash_path, basis, st)

    import contextlib

    trace_cm = (jax.profiler.trace(args.trace, create_perfetto_trace=True)
                if args.trace else contextlib.nullcontext())
    with trace_cm:
        res = scf_diatomic(
            basis, nela, nelb, method=args.method, maxit=args.maxit,
            convthr=args.convthr, verbose=True, guess=args.guess, ops=ops,
            P0a=P0a, P0b=P0b, Ez=args.Ez, Qzz=args.Qzz, Bz=args.Bz,
            finitenuc=args.finitenuc, Rrms1=args.Rrms1, Rrms2=args.Rrms2,
            restricted=args.restricted, perturb=args.perturb, seed=args.seed,
            diisorder=args.diisorder, diiseps=args.diiseps, dftthr=args.dftthr,
            ldft=args.ldft, occs=occs, readocc_until=args.readocc,
            diisthr=args.diisthr, save_cb=save_cb if args.save else None,
            diag=bool(args.diag), maverage=args.maverage, ndev=args.ndev,
        )
    if args.trace:
        print(f"profiler trace written to {args.trace}")
    if args.save:
        if args.save.endswith((".chk", ".h5", ".hdf5")):
            # reference-schema HDF5 export (readable by upstream HelFEM
            # --load and its density_line/density_grid post-processing)
            from helfem_tpu.utils.checkpoint_h5 import save_diatomic_chk

            save_diatomic_chk(args.save, basis, res, nela, nelb)
        else:
            from helfem_tpu.utils.checkpoint import save_diatomic

            save_diatomic(args.save, basis, res)
        print(f"checkpoint saved to {args.save}")
    print()
    for name, val in [
        ("Kinetic", res.Ekin), ("Nuclear attraction", res.Enucattr),
        ("Nuclear repulsion", res.Enucrep), ("Coulomb", res.Ecoul),
        ("Exact exchange", res.Exx), ("Exchange-correlation", res.Exc),
        ("Total", res.E),
    ]:
        print(f"{name:<21s} energy: % .16f" % val)
    # post-SCF analysis (reference: src/diatomic/main.cpp:1000-1086)
    print(f"{'Virial ratio':<21s}       : % .16f" % (-res.E / res.Ekin))
    print(f"{'Hellmann-Feynman':<21s}  force: %e"
          % ((2 * res.Ekin + res.Enucattr + res.Enucrep + res.Ecoul + res.Exx + res.Exc) / R))

    import jax.numpy as jnp
    import numpy as np

    from helfem_tpu.models.diatomic_tools import (
        nuclear_densities_dia,
        occupied_orbital_vectors_dia,
        orbital_moments_dia,
    )
    from helfem_tpu.scf.diatomic_scf import density_dia

    ops_post = ops
    Pa_f = np.asarray(density_dia(ops_post, jnp.asarray(res.orbs_a), jnp.asarray(res.occ_a)))
    Pb_f = Pa_f if res.orbs_b is None else np.asarray(
        density_dia(ops_post, jnp.asarray(res.orbs_b), jnp.asarray(res.occ_b))
    )
    P_f = Pa_f + Pb_f
    mv = basis.shell_mask().reshape(-1)
    eldip = -float(np.vdot(P_f, basis.dipole_z() * mv[:, None] * mv[None, :]))
    elquad = -float(np.vdot(P_f, basis.quadrupole_zz() * mv[:, None] * mv[None, :]))
    nucdip = (Z2 - Z1) * basis.Rhalf
    nucquad = (Z1 + Z2) * basis.Rhalf**2
    print()
    print(f"Electronic dipole     moment % .10e" % eldip)
    print(f"Nuclear    dipole     moment % .10e" % nucdip)
    print(f"Total      dipole     moment % .10e" % (eldip + nucdip))
    print(f"Electronic quadrupole moment % .10e" % elquad)
    print(f"Nuclear    quadrupole moment % .10e" % nucquad)
    print(f"Total      quadrupole moment % .10e" % (elquad + nucquad))
    print("\nNuclear electron densities")
    nl, nr = nuclear_densities_dia(basis, P_f)
    if Z1:
        print(f"left : % .10e" % nl)
    if Z2:
        print(f"right: % .10e" % nr)

    if res.orbE_blocks_a is not None and nela > 0:
        orbs_occ = occupied_orbital_vectors_dia(
            basis, res.orbs_a, res.occ_a, res.orbE_blocks_a
        )
        print("\nOccupied orbital analysis (alpha):")
        print(f"{'io':>2s} {'energy':>13s} {'1/<rl^-1>':>12s} {'<rl>':>12s} "
              f"{'sqrt(<rc^2>)':>12s} {'<rr>':>12s}")
        for io, (E_o, _, c) in enumerate(orbs_occ):
            m = orbital_moments_dia(basis, c)
            print(f"{io + 1:2d} % e %e %e %e %e"
                  % (E_o, 1.0 / m['left'][-1], m['left'][1],
                     np.sqrt(m['center'][2]), m['right'][1]))

    if res.orbsym_a is not None and nela > 0:
        from helfem_tpu.utils.elements import HARTREE_IN_EV

        nshow = min(nela + 2, len(res.orbE_a))
        print("\noccupied + lowest virtual orbital energies:")
        for i in range(nshow):
            tag = "occ" if i < nela else "vir"
            print(f"  {i + 1:3d} {res.orbsym_a[i]:>8s}  % .9f  {tag}" % res.orbE_a[i])
        if len(res.orbE_a) > nela:
            gap = (res.orbE_a[nela] - res.orbE_a[nela - 1]) * HARTREE_IN_EV
            print(f"HOMO-LUMO gap: {gap:.3f} eV")
    if not res.converged:
        print("WARNING: SCF did not converge!")
    return res


if __name__ == "__main__":
    main()
