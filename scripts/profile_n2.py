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

from helfem_tpu.models.diatomic import DiatomicBasis, coulomb_dia, exchange_dia
from helfem_tpu.scf.diatomic_scf import eig_blocks_dia


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


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

    jJ = jax.jit(lambda P: coulomb_dia(ops, P))
    jK = jax.jit(lambda P: exchange_dia(ops, P))

    t0 = time.perf_counter()
    F = ops.H0 + jJ(P) + jK(P)
    jax.block_until_ready(F)
    print("compile+first:", time.perf_counter() - t0)
    print("J:", timeit(jJ, P))
    print("K:", timeit(jK, P))

    jE = jax.jit(lambda F: eig_blocks_dia(ops, F))
    print("eig_blocks:", timeit(jE, F))


if __name__ == "__main__":
    main()
