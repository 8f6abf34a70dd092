"""Per-stage timing of the N2 Fock build on the current backend.

Usage: python scripts/profile_n2.py [lmax] [nnodes]
  lmax=6  nnodes=8  -> the bench N2 PBE discretization
  lmax=12 nnodes=15 -> the reference-converged discretization

Measures warm per-call wall time of J, K, and the blocked eigensolve.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import sys as _sys, os as _os
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path.insert(0, _d)
_sys.path.insert(0, _os.path.dirname(_d))  # repo root for helfem_tpu

from helfem_tpu.models.diatomic import (
    DiatomicBasis,
    coulomb_dia,
    exchange_dia,
    exchange_dia_occ,
)
from helfem_tpu.scf.diatomic_scf import eig_blocks_dia


from _timing import sync as _sync, timeit  # shared methodology


def main():
    lmax = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    nnodes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lv = (lmax,) * 3 if lmax > 6 else (lmax, lmax)
    basis = DiatomicBasis(Z1=7, Z2=7, Rbond=2.0743, lmax=lv,
                          rmax=40.0 if lmax > 6 else 25.0, nelem=5,
                          nnodes=nnodes)
    t0 = time.perf_counter()
    ops = basis.build_operators()
    print("setup:", time.perf_counter() - t0, " nbf:", basis.nbf,
          " nsteps:", int(ops.step_ilm.shape[0]))
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (basis.nbf, basis.nbf), dtype=jnp.float64)
    P = 0.5 * (P + P.T) * 1e-2

    # ops rides as a jit ARGUMENT (device buffers), not a closure constant:
    # closed-over TEI tables get serialized INTO the remote-compile request
    # body, which exceeds the service's length limit at lmax=12 (HTTP 413)
    jJ_ = jax.jit(coulomb_dia)
    jK_ = jax.jit(exchange_dia)
    jJ = lambda P: jJ_(ops, P)
    jK = lambda P: jK_(ops, P)

    # occupied-orbital factorized exchange: the SCF path at scale (no=9 =
    # N2's 7 doubly-occupied orbitals + the driver's tight +2 margin)
    no = 9
    Co = jax.random.normal(key, (basis.nbf, no), dtype=jnp.float64) * 0.1
    jKo_ = jax.jit(exchange_dia_occ)
    jKo = lambda C: jKo_(ops, C)

    t0 = time.perf_counter()
    Ko = jKo(Co)
    _sync(Ko)
    print("K_occ compile+first:", time.perf_counter() - t0, flush=True)
    t0 = time.perf_counter()
    Jm = jJ(P)
    _sync(Jm)
    print("J compile+first:", time.perf_counter() - t0, flush=True)
    print("K_occ:", timeit(jKo, Co), flush=True)
    print("J:", timeit(jJ, P), flush=True)
    dense_K = int(float(__import__("os").environ.get("HELFEM_PROF_DENSE", "1")))
    if dense_K:
        t0 = time.perf_counter()
        Km = jK(P)
        _sync(Km)
        print("K_dense compile+first:", time.perf_counter() - t0, flush=True)
        print("K_dense:", timeit(jK, P), flush=True)
    F = ops.H0 + Jm + Ko

    jE_ = jax.jit(eig_blocks_dia)
    jE = lambda F: jE_(ops, F)
    print("eig_blocks:", timeit(jE, F), flush=True)

    # fixed-size calibration op: detects a degraded tunnel / slow chip so
    # run-to-run J/K comparisons are made at known chip speed
    A = jax.random.normal(key, (2048, 2048), dtype=jnp.float64)
    jM = jax.jit(lambda a: a @ a)
    tM = timeit(jM, A)
    print("2048 matmul:", tM, "-> TF/s:", 2 * 2048**3 / tM / 1e12)


if __name__ == "__main__":
    main()
