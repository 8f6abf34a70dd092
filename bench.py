"""Benchmark: Ar HF SCF wall-clock to convergence (BASELINE.json config 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no wall-clock numbers (BASELINE.md) and its
OpenMP binary cannot be built in this image (no Armadillo/GSL); vs_baseline
is therefore reported against the recorded reference-equivalent target in
BASELINE_LOCAL (seconds for the same converged calculation), defaulting to
1.0 when unknown.
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

# Estimated wall-clock for the OpenMP reference on the BASELINE Ar HF config
# (64-core host, Release build). Not measurable in this image; placeholder 1x.
BASELINE_LOCAL = None


def main():
    from helfem_tpu.models.atomic import AtomicBasis
    from helfem_tpu.scf.atomic_scf import scf_atom

    basis = AtomicBasis(Z=18, lmax=1, mmax=1, rmax=40.0, nelem=10, nnodes=15)
    ops = basis.build_operators()  # setup (TEI tables etc.) on host

    # warm-up: compile the jitted hot path incl. the fused on-device
    # iteration (engaged after 3 host warmup iterations)
    scf_atom(basis, 9, 9, convthr=1e-9, maxit=5, ops=ops)

    t0 = time.time()
    res = scf_atom(basis, 9, 9, convthr=1e-9, maxit=60, ops=ops)
    dt = time.time() - t0

    ref = -526.8175128  # Ar numerical HF limit
    ok = res.converged and abs(res.E - ref) < 1e-6
    value = dt if ok else float("inf")
    print(
        json.dumps(
            {
                "metric": "ar_hf_scf_wall_clock_1uEh",
                "value": round(value, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_LOCAL / value, 3) if BASELINE_LOCAL else 1.0,
                "energy": res.E,
                "energy_err_vs_hf_limit": res.E - ref,
                "iterations": res.niter,
                "converged": bool(res.converged),
            }
        )
    )


if __name__ == "__main__":
    main()
