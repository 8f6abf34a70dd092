"""Benchmark: BOTH driver metrics from BASELINE.json on the real TPU chip.

1. Ar HF  (BASELINE config 2): SCF wall-clock to 1 uEh convergence.
2. N2 PBE (BASELINE config 5): prolate-spheroidal two-center FEM,
   sigma+pi basis (lmax = 6 per |m|), PBE via the JAX-native functionals.
Plus a heavier atomic profile point (Xe HF, lmax=3) so scaling beyond the
~560-bf Ar problem is on record.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
value = Ar-HF SCF seconds + N2-PBE SCF seconds and the "profile" dict holds
the per-phase breakdown (host setup / TEI tables, compile, SCF wall, per-
iteration, eigensolve probe) the headline number is made of.

The reference repo publishes no wall-clock numbers (BASELINE.md) and its
OpenMP binary cannot be built in this image (no Armadillo/GSL), so
vs_baseline stays 1.0; the profile section is the evidence that the TPU
number is dispatch-bound setup + a fused on-device SCF, not padding.

Energy gates: Ar vs the numerical HF limit; N2 PBE vs this repo's own CPU
run of the identical discretization (real f64, recorded below) -- a TPU
mismatch > 1 uEh fails the metric (value = inf).
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

BASELINE_LOCAL = None  # reference binary not buildable in this image

AR_HF_LIMIT = -526.8175128  # numerical HF limit (Saito 2009)
# N2 PBE at lmax=(6,6), nelem=5, nnodes=8, Rmax=25, Rbond=2.0743: this
# repo's CPU (true f64) converged value (23.6 s, 9 iterations); the TPU run
# matched it to 3e-12 Eh when recorded and must stay within 1 uEh.
N2_PBE_CPU = -108.978708437276
XE_HF_LIMIT = -7232.1383638  # Cinal 2020, J. Math. Chem. 58, 1571


def bench_ar():
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    basis = AtomicBasis(Z=18, lmax=1, mmax=1, rmax=40.0, nelem=10, nnodes=15)
    t0 = time.perf_counter()
    ops = basis.build_operators()  # host setup: radial TEI tables etc.
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scf_atom(basis, 9, 9, convthr=1e-9, maxit=5, ops=ops)  # compile warmup
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = scf_atom(basis, 9, 9, convthr=1e-9, maxit=60, ops=ops)
    scf_s = time.perf_counter() - t0

    # eigensolve probe: one blocked generalized eigh on the converged Fock
    import jax.numpy as jnp

    from helfem_tpu.models.atomic import coulomb, exchange
    from helfem_tpu.utils.linalg import eig_gsym_lm

    Pa = jnp.zeros((basis.nbf, basis.nbf))
    F = ops.H0 + coulomb(ops, Pa) + exchange(ops, Pa)
    E, C = eig_gsym_lm(F, ops.Sinvh_rad)
    jax.block_until_ready(C)
    t0 = time.perf_counter()
    E, C = eig_gsym_lm(F, ops.Sinvh_rad)
    jax.block_until_ready(C)
    eigh_s = time.perf_counter() - t0

    ok = res.converged and abs(res.E - AR_HF_LIMIT) < 1e-6
    return {
        "ok": bool(ok),
        "scf_s": round(scf_s, 3),
        "setup_s": round(setup_s, 3),
        "compile_s": round(compile_s, 3),
        "iterations": res.niter,
        "per_iter_s": round(scf_s / max(res.niter, 1), 4),
        "eigh_probe_s": round(eigh_s, 4),
        "energy": res.E,
        "energy_err_vs_hf_limit": res.E - AR_HF_LIMIT,
        "converged": bool(res.converged),
    }


def bench_n2():
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import scf_diatomic

    basis = DiatomicBasis(
        Z1=7, Z2=7, Rbond=2.0743, lmax=(6, 6), rmax=25.0, nelem=5, nnodes=8
    )
    t0 = time.perf_counter()
    ops = basis.build_operators()  # host setup incl. channel-batched TEI tables
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scf_diatomic(basis, 7, 7, method="PBE", convthr=1e-6, maxit=4, ops=ops)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = scf_diatomic(basis, 7, 7, method="PBE", convthr=1e-6, maxit=60, ops=ops)
    scf_s = time.perf_counter() - t0

    ok = res.converged and (
        N2_PBE_CPU is None or abs(res.E - N2_PBE_CPU) < 1e-6
    )
    out = {
        "ok": bool(ok),
        "scf_s": round(scf_s, 3),
        "setup_s": round(setup_s, 3),
        "compile_s": round(compile_s, 3),
        "iterations": res.niter,
        "per_iter_s": round(scf_s / max(res.niter, 1), 4),
        "energy": res.E,
        "converged": bool(res.converged),
    }
    if N2_PBE_CPU is not None:
        out["energy_err_vs_cpu_f64"] = res.E - N2_PBE_CPU
    return out


def bench_xe():
    """Heavier atomic profile point: Xe HF with an empty f channel
    (lmax=3) -- 4x the symmetry blocks and Z=54 vs the Ar headline."""
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    basis = AtomicBasis(Z=54, lmax=3, mmax=3, rmax=40.0, nelem=8, nnodes=12, zexp=2.5)
    t0 = time.perf_counter()
    ops = basis.build_operators()
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    scf_atom(basis, 27, 27, convthr=1e-8, maxit=4, ops=ops)  # compile warmup
    compile_s = time.perf_counter() - t0
    # convthr 3e-8 (not 1e-9): the DIIS-error floor of the emulated-f64 TPU
    # eigh sits between 1e-9 and 1e-8 for ||F|| ~ 1e5 Fock matrices; the
    # energy is already stable to ~1e-7 Eh well before that (gated below)
    t0 = time.perf_counter()
    res = scf_atom(basis, 27, 27, convthr=3e-8, maxit=50, ops=ops)
    scf_s = time.perf_counter() - t0
    return {
        "ok": bool(res.converged and abs(res.E - XE_HF_LIMIT) < 3e-6),
        "scf_s": round(scf_s, 3),
        "setup_s": round(setup_s, 3),
        "compile_s": round(compile_s, 3),
        "iterations": res.niter,
        "per_iter_s": round(scf_s / max(res.niter, 1), 4),
        "energy": res.E,
        "energy_err_vs_hf_limit": res.E - XE_HF_LIMIT,
        "converged": bool(res.converged),
    }


def bench_gensap():
    """BASELINE config 3: spherically-averaged atom + SAP-potential
    generation (gensap) for Kr."""
    import numpy as np

    from helfem_tpu.models.sadatom import SadAtomBasis, coulomb_screening, solve_sadatom

    basis = SadAtomBasis(Z=36, lmax=2, rmax=40.0, nelem=8, nnodes=12)
    t0 = time.perf_counter()
    res = solve_sadatom(basis, method="SVWN", convthr=1e-7, search=False)
    scf_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    Zeff = coulomb_screening(basis, np.asarray(res.Pl).sum(axis=0))  # SAP export
    sap_s = time.perf_counter() - t0
    # closed-shell Kr: the spherically-averaged LSD atom equals full LSD;
    # NIST "Atomic Reference Data" gives -2750.147940
    ok = (
        res.converged
        and abs(res.E + 2750.147940) < 1e-5
        and np.all(np.isfinite(np.asarray(Zeff)))
    )
    return {
        "ok": bool(ok),
        "scf_s": round(scf_s, 3),
        "sap_export_s": round(sap_s, 3),
        "energy": res.E,
        "converged": bool(res.converged),
    }


def main():
    ar = bench_ar()
    n2 = bench_n2()
    xe = bench_xe()
    sap = bench_gensap()
    ok = ar["ok"] and n2["ok"]
    value = ar["scf_s"] + n2["scf_s"] if ok else float("inf")
    print(
        json.dumps(
            {
                "metric": "ar_hf_plus_n2_pbe_scf_wall_clock_1uEh",
                "value": round(value, 3) if ok else value,
                "unit": "s",
                "vs_baseline": round(BASELINE_LOCAL / value, 3) if BASELINE_LOCAL else 1.0,
                "profile": {"ar_hf": ar, "n2_pbe": n2, "xe_hf_lmax3": xe,
                            "gensap_kr": sap},
            }
        )
    )


if __name__ == "__main__":
    main()
