"""`helfem-atomic`: atomic HF/DFT SCF driver CLI.

Flag names mirror the reference `atomic` program (src/atomic/main.cpp:63-119)
so reference comparisons are scriptable.
"""

import argparse

import numpy as np


def _apply_pars_files(method: str, x_pars: str, c_pars: str) -> str:
    """Fold --x_pars/--c_pars parameter files into the method string
    (reference: libxc ext_params files, src/atomic/main.cpp:107-108; here
    the files hold 'key=value' lines matched against the functional's named
    parameters). Only 'x_func,c_func' pair methods (or a single functional
    with --x_pars) can take parameter files."""
    parts = method.split(",")
    if len(parts) > 2 or "[" in method:
        raise SystemExit("--x_pars/--c_pars need a plain 'x_func,c_func' method")

    def read(path):
        kv = []
        with open(path) as f:
            for line in f:
                line = line.split("#")[0].strip()
                if line:
                    kv.append(line.replace(" ", ""))
        return ",".join(kv)

    if x_pars:
        parts[0] = f"{parts[0]}[{read(x_pars)}]"
    if c_pars:
        if len(parts) < 2:
            raise SystemExit("--c_pars given but the method has no correlation part")
        parts[1] = f"{parts[1]}[{read(c_pars)}]"
    return ",".join(parts)


def parse_nela_nelb(Z: int, Q: int, M: int, nela: int, nelb: int):
    """(reference: scf::parse_nela_nelb)."""
    if nela or nelb:
        return nela, nelb
    nel = Z - Q
    if M == 0:
        M = 1 if nel % 2 == 0 else 2
    na = (nel + M - 1) // 2
    return na, nel - na


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-atomic", description=__doc__)
    p.add_argument("--Z", required=True, help="nuclear charge (number or symbol)")
    p.add_argument("--Zl", default="", help="left off-center charge")
    p.add_argument("--Zr", default="", help="right off-center charge")
    p.add_argument("--Rmid", type=float, default=0.0, help="off-center distance")
    p.add_argument("--nela", type=int, default=0)
    p.add_argument("--nelb", type=int, default=0)
    p.add_argument("--Q", type=int, default=0, help="charge state")
    p.add_argument("--M", type=int, default=0, help="spin multiplicity")
    p.add_argument("--lmax", type=int, required=True)
    p.add_argument("--mmax", type=int, required=True)
    p.add_argument("--Rmax", type=float, default=40.0)
    p.add_argument("--grid", type=int, default=4)
    p.add_argument("--zexp", type=float, default=2.0)
    p.add_argument("--nelem", type=int, required=True)
    p.add_argument("--nnodes", type=int, default=15)
    p.add_argument("--nquad", type=int, default=0)
    p.add_argument("--primbas", type=int, default=4,
                   help="primitive polynomial basis id (3 Legendre, 4 LIP, "
                        "5 HIP, 6-11 general HIP, 100/101 Chebyshev nodes)")
    p.add_argument("--nelem0", type=int, default=0,
                   help="elements in the finite-nucleus sub-grid / per "
                        "off-center grid section (0 = plain grid)")
    p.add_argument("--grid0", type=int, default=2, help="finite-nucleus sub-grid type")
    p.add_argument("--zexp0", type=float, default=2.0)
    p.add_argument("--add_conf", type=int, default=1,
                   help="insert an element boundary at the confinement onset radius")
    p.add_argument("--load", default="", help="warm start from a checkpoint "
                   "(cross-basis orbital projection); .chk/.h5/.hdf5 reads the "
                   "reference HDF5 schema, anything else npz")
    p.add_argument("--readocc", default="", help="occupation file: lines 'l m na nb' "
                   "(enforced per-(l,m) occupations)")
    p.add_argument("--maxit", type=int, default=50)
    p.add_argument("--convthr", type=float, default=1e-7)
    p.add_argument("--method", default="HF")
    p.add_argument("--Ez", type=float, default=0.0)
    p.add_argument("--Qzz", type=float, default=0.0)
    p.add_argument("--Bz", type=float, default=0.0)
    p.add_argument("--iguess", type=int, default=2, help="0 core, 1 GSZ, 2 SAP, 3 TF")
    p.add_argument("--finitenuc", type=int, default=0,
                   help="0 point, 2 gaussian, 3 spherical, 4 hollow, 5 regularized (Gygi; Rrms = a)")
    p.add_argument("--Rrms", type=float, default=0.0)
    p.add_argument("--iconf", type=int, default=0)
    p.add_argument("--conf_N", type=int, default=0)
    p.add_argument("--conf_R", type=float, default=0.0)
    p.add_argument("--conf_barrier", type=float, default=0.0)
    p.add_argument("--shift_conf", type=float, default=0.0)
    p.add_argument("--save", default="helfem.npz", help="checkpoint file; a "
                   ".chk/.h5/.hdf5 extension writes the reference HDF5 schema")
    p.add_argument("--dftthr", type=float, default=1e-12)
    # SCF control knobs (reference: src/atomic/main.cpp:63-119)
    p.add_argument("--restricted", type=int, default=-1,
                   help="-1 auto, 0 unrestricted, 1 restricted (ROHF if open shell)")
    p.add_argument("--symmetry", type=int, default=-1,
                   help="force symmetry blocking: 0 none, 1 m, 2 (l,m); -1 auto")
    p.add_argument("--maverage", action="store_true",
                   help="average the Fock matrix over m within each l")
    p.add_argument("--perturb", type=float, default=0.0,
                   help="random orthogonal rotation amplitude for the guess orbitals")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dampfock", type=float, default=1.0,
                   help="damping factor for occupied-virtual MO Fock blocks")
    p.add_argument("--dampthr", type=float, default=0.5,
                   help="apply damping while the DIIS error is above this")
    p.add_argument("--diisorder", type=int, default=10, help="DIIS history length")
    p.add_argument("--diag", type=int, default=1,
                   help="1: symmetric-inverse-sqrt whitening (exact "
                        "diagonalization); 0: inverse-Cholesky whitening "
                        "(reference --diag, src/atomic/main.cpp:88)")
    p.add_argument("--eigiter", type=int, default=0,
                   help="when > 0, solve each symmetry block iteratively "
                        "(shift-invert ARPACK Lanczos) for only the lowest "
                        "N eigenpairs instead of a full dense eigh "
                        "(reference: scf::eig_iter)")
    p.add_argument("--diisthr", type=float, default=None,
                   help="DIIS error below which extrapolation is pure C2-DIIS; "
                        "between diisthr and diiseps the DIIS/ADIIS weights are "
                        "blended on the reference's sliding scale "
                        "(src/general/diis.cpp:241); unset = hard switch at diiseps")
    p.add_argument("--diiseps", type=float, default=0.1,
                   help="DIIS error below which extrapolation starts mixing in")
    p.add_argument("--ldft", type=int, default=0,
                   help="theta rule order for the dft grid (0 = auto)")
    p.add_argument("--mdft", type=int, default=0,
                   help="accepted for reference parity; the phi integral is "
                        "evaluated analytically here, so it has no effect")
    p.add_argument("--angstrom", action="store_true",
                   help="off-center distance Rmid given in angstrom")
    p.add_argument("--x_pars", default="", help="file of 'key=value' parameter "
                   "overrides for the exchange functional")
    p.add_argument("--c_pars", default="", help="same for the correlation functional")
    p.add_argument("--zeroder", action="store_true",
                   help="drop the derivative DOF at Rmax too (Hermite bases)")
    p.add_argument("--trace", default="",
                   help="write a jax.profiler device/XLA trace of the SCF to "
                        "this directory (TensorBoard/Perfetto format)")
    p.add_argument("--ndev", type=int, default=0,
                   help="run the SCF over an N-device mesh: the Fock build "
                        "shards the TEI L axis and the DFT-grid element axis, "
                        "the blocked eigensolve shards the symmetry-block "
                        "axis (the multi-chip replacement for the reference's "
                        "OpenMP, src/atomic/TwoDBasis.cpp:987)")
    p.add_argument("--taylor_order", type=int, default=-1,
                   help="accepted for reference parity; B(r)/r near the origin "
                        "is evaluated by exact (x - x0) polynomial division here "
                        "(ops/radial.py), so the Taylor-expansion order has no "
                        "effect")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom
    from helfem_tpu.utils.checkpoint import save_atomic
    from helfem_tpu.utils.elements import HARTREE_IN_EV, get_Z

    Z = get_Z(args.Z)
    Zl = get_Z(args.Zl) if args.Zl else 0
    Zr = get_Z(args.Zr) if args.Zr else 0
    if args.angstrom:
        from helfem_tpu.utils.elements import ANGSTROM_IN_BOHR

        args.Rmid *= ANGSTROM_IN_BOHR
    if args.x_pars or args.c_pars:
        args.method = _apply_pars_files(args.method, args.x_pars, args.c_pars)
    nela, nelb = parse_nela_nelb(Z + Zl + Zr, args.Q, args.M, args.nela, args.nelb)
    guess = {0: "core", 1: "GSZ", 2: "SAP", 3: "TF"}[args.iguess]
    nucmodel = {0: "point", 1: "point", 2: "gaussian", 3: "spherical",
                4: "hollow", 5: "regularized"}[args.finitenuc]

    from helfem_tpu.utils.timer import Timer

    timer = Timer()
    basis = AtomicBasis(
        Z=Z, lmax=args.lmax, mmax=args.mmax, rmax=args.Rmax, nelem=args.nelem,
        nnodes=args.nnodes, nquad=args.nquad, igrid=args.grid, zexp=args.zexp,
        primbas=args.primbas,
        finitenuc=nucmodel, Rrms=args.Rrms, nelem0=args.nelem0,
        igrid0=args.grid0, zexp0=args.zexp0, Zl=Zl, Zr=Zr, Rmid=args.Rmid,
        conf_boundary=args.shift_conf if (args.add_conf and args.iconf) else 0.0,
        zeroder=args.zeroder,
    )
    timer.lap("basis set formation")
    print(f"Running {args.method} on Z={Z} with {nela}+{nelb} electrons, "
          f"{basis.nbf} basis functions ({basis.nang} angular x {basis.nrad} radial)")
    from helfem_tpu.ops.xc import parse_method_rs as _pm

    spec = _pm(args.method)
    funcs = spec.funcs
    if spec.omega != 0.0:
        # reference printout, src/atomic/main.cpp:363-371
        print(f"Using range-separated exchange with omega = {spec.omega:.3f} "
              f"({spec.kernel} kernel)")
        print(f"Using {100 * (spec.kfull + spec.kshort):.3f} % short-range and "
              f"{100 * spec.kfull:.3f} % long-range exchange.")
    if funcs:
        # grid-accuracy self-check, as the reference prints
        # (src/atomic/main.cpp:411-441)
        import numpy as _np

        from helfem_tpu.models.atomic_dft import (
            build_dft_grid, eval_kinetic_grid, eval_overlap_grid,
        )

        gch = build_dft_grid(basis)
        S = basis.overlap()
        dS = _np.abs(_np.asarray(eval_overlap_grid(gch, basis.nrad)) - S)
        nrm = _np.sqrt(_np.outer(_np.diag(S), _np.diag(S)))
        print(f"Error in overlap matrix evaluated through xc grid is {(_np.linalg.norm(dS/nrm)):e}")
        T = basis.kinetic()
        dT = _np.abs(_np.asarray(eval_kinetic_grid(gch, basis.nrad)) - T) / (1 + _np.abs(T))
        print(f"Relative error in kinetic matrix evaluated through xc grid is {(_np.linalg.norm(dT)):e}")

    # warm start from a checkpoint (cross-basis orbital projection)
    P0a = P0b = None
    if args.load:
        if args.load.endswith((".chk", ".h5", ".hdf5")):
            # reference-schema HDF5 checkpoint (interoperable with upstream
            # HelFEM --save files; utils/checkpoint_h5.py)
            from helfem_tpu.utils.checkpoint_h5 import (
                load_atomic_chk,
                warm_start_density_atomic_h5,
            )

            oldb, d = load_atomic_chk(args.load)
            P0a, P0b = warm_start_density_atomic_h5(basis, oldb, d)
            print(f"Warm start from HDF5 checkpoint {args.load}")
        else:
            from helfem_tpu.utils.checkpoint import load_atomic, warm_start_density

            oldb, d = load_atomic(args.load)
            P0a, P0b = warm_start_density(basis, oldb, d)
            print(f"Warm start from {args.load} (E = {float(d['E']):.9f})")

    # enforced occupations from a file: lines 'l m na nb'
    occs = None
    if args.readocc:
        occs = {}
        with open(args.readocc) as f:
            for line in f:
                line = line.split("#")[0].strip()
                if not line:
                    continue
                l_, m_, na_, nb_ = line.split()
                occs[(int(l_), int(m_))] = (float(na_), float(nb_))

    # crash-recovery checkpoint: write the current state every host pass
    from types import SimpleNamespace

    from helfem_tpu.utils.checkpoint import save_atomic

    def save_cb(it, Etot, Ea, Ca, occa, Eb, Cb, occb):
        import numpy as _np

        st = SimpleNamespace(
            converged=False, E=Etot,
            orbE_a=_np.sort(Ea.ravel()), orbs_a=_np.asarray(Ca), occ_a=occa,
            orbE_b=None if Eb is None else _np.sort(_np.asarray(Eb).ravel()),
            orbs_b=None if Cb is None else _np.asarray(Cb),
            occ_b=occb,
        )
        # crash-recovery writes stay npz; when the final --save target is a
        # reference-schema HDF5 file, write them alongside it instead of
        # mixing formats in one path
        crash_path = args.save
        if crash_path.endswith((".chk", ".h5", ".hdf5")):
            crash_path += ".crash.npz"
        save_atomic(crash_path, basis, st)

    import contextlib

    # --trace: structured XLA/device trace of the SCF (view in
    # TensorBoard); complements the phase Timer, which stays on regardless
    trace_cm = (jax.profiler.trace(args.trace, create_perfetto_trace=True)
                if args.trace else contextlib.nullcontext())
    with trace_cm:
        res = scf_atom(
            basis, nela, nelb, method=args.method, maxit=args.maxit,
            convthr=args.convthr, guess=guess, verbose=True, dftthr=args.dftthr,
            Ez=args.Ez, Qzz=args.Qzz, Bz=args.Bz, iconf=args.iconf,
            conf_N=args.conf_N, conf_R=args.conf_R, conf_barrier=args.conf_barrier,
            shift_conf=args.shift_conf, finitenuc=nucmodel, Rrms=args.Rrms,
            Zl=Zl, Zr=Zr, Rmid=args.Rmid, occs=occs, P0a=P0a, P0b=P0b,
            save_cb=save_cb if args.save else None,
            restricted=args.restricted, symmetry=args.symmetry,
            maverage=args.maverage, perturb=args.perturb, seed=args.seed,
            dampfock=args.dampfock, dampthr=args.dampthr,
            diisorder=args.diisorder, diiseps=args.diiseps, diisthr=args.diisthr,
            ldft=args.ldft, diag=bool(args.diag), eigiter=args.eigiter,
            ndev=args.ndev,
        )
    if args.trace:
        print(f"profiler trace written to {args.trace}")
    timer.lap("SCF")
    print()
    for name, val in [
        ("Kinetic", res.Ekin), ("Nuclear attraction", res.Enuc),
        ("Coulomb", res.Ecoul), ("Exact exchange", res.Exx),
        ("Exchange-correlation", res.Exc), ("Field/confinement", res.Efield),
        ("Total", res.E),
    ]:
        print(f"{name:<21s} energy: % .16f" % val)
    print(f"{'Virial ratio':<21s}       : % .16f" % (-res.E / res.Ekin))
    if len(res.orbE_a) > nela and nela > 0:
        gap = (res.orbE_a[nela] - res.orbE_a[nela - 1]) * HARTREE_IN_EV
        print(f"HOMO-LUMO gap: {gap:.3f} eV")
    if res.orbsym_a is not None and nela > 0:
        nshow = min(nela + 2, len(res.orbE_a))
        print("occupied + lowest virtual orbital energies:")
        for i in range(nshow):
            tag = "occ" if i < nela else "vir"
            print(f"  {i + 1:3d} {res.orbsym_a[i]:>8s}  % .9f  {tag}" % res.orbE_a[i])
    if not res.converged:
        print("WARNING: SCF did not converge!")
    # post-SCF analysis (reference: src/atomic/main.cpp:1000-1059)
    from helfem_tpu.scf.atomic_scf import atomic_analysis

    symm_used = args.symmetry if args.symmetry >= 0 else (
        1 if (args.Ez or args.Qzz or ((Zl or Zr) and args.Rmid > 0)) else 2
    )
    ana = atomic_analysis(basis, res, symm=symm_used)
    print()
    print(f"Virial ratio -E/T     : {ana['virial_ratio']:.10f}")
    for n in (-1, 1, 2, 3):
        print(f"<r^{n:+d}>                : {ana[f'<r^{n}>']:.10f}")
    print(f"Density at nucleus    : {ana['density_at_nucleus']:.10f}")
    print(f"Density gradient      : {ana['density_gradient_at_nucleus']:.10f}")
    print(f"Cusp -n'(0)/(2 Z n(0)): {ana['cusp']:.10f}")
    print(f"Dipole <z>            : {ana['dipole_z']:.10e}")
    print(f"Quadrupole <zz>       : {ana['quadrupole_zz']:.10e}")
    if args.save:
        if args.save.endswith((".chk", ".h5", ".hdf5")):
            # reference-schema HDF5 export (readable by upstream HelFEM
            # --load and its post-processing tools); the per-iteration
            # crash-recovery writes above stay in the npz format
            from helfem_tpu.utils.checkpoint_h5 import save_atomic_chk

            save_atomic_chk(args.save, basis, res, nela, nelb)
        else:
            save_atomic(args.save, basis, res)
        print(f"checkpoint saved to {args.save}")
    return res


if __name__ == "__main__":
    main()
