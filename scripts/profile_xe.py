"""Per-stage timing of the Xe lmax=3 Fock build on the current backend.

Measures warm per-call wall time of J, K, blocked eigh, and the DIIS
commutator separately, plus a 2048^2 f64 matmul as the chip-envelope
reference. Run on the TPU (default env) or CPU
(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu).
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import sys as _sys, os as _os
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path.insert(0, _d)
_sys.path.insert(0, _os.path.dirname(_d))  # repo root for helfem_tpu

from helfem_tpu.models.atomic import (AtomicBasis, channel_diag, coulomb,
                                      exchange, exchange_bd)
from helfem_tpu.utils.linalg import eig_gsym_lm


from _timing import sync as _sync, timeit  # shared methodology


def main():
    basis = AtomicBasis(Z=54, lmax=3, mmax=3, rmax=40.0, nelem=8, nnodes=12,
                        zexp=2.5)
    ops = basis.build_operators()
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (basis.nbf, basis.nbf), dtype=jnp.float64)
    P = 0.5 * (P + P.T) * 1e-2

    # ops as jit ARGUMENTS (not closure constants): closed-over tables are
    # serialized into the remote-compile request body and can exceed the
    # service's length limit on big configs
    jJ_, jK_, jE_ = jax.jit(coulomb), jax.jit(exchange), jax.jit(eig_gsym_lm)
    jJ = lambda P: jJ_(ops, P)
    jK = lambda P: jK_(ops, P)
    jE = lambda F: jE_(F, ops.Sinvh_rad)
    jC = jax.jit(lambda F, P: F @ P - P @ F)
    # the SCF hot path: block-diagonal-density exchange (symm=2 blocks)
    jKbd_ = jax.jit(lambda o, P: exchange_bd(o, channel_diag(P, basis.nang,
                                                             basis.nrad)))
    jKbd = lambda P: jKbd_(ops, P)

    F = ops.H0 + jJ(P) + jK(P)
    print("J:", timeit(jJ, P))
    print("K (dense):", timeit(jK, P))
    print("K (bd, SCF hot path):", timeit(jKbd, P))
    print("eig_blocks:", timeit(jE, F))
    print("commutator:", timeit(jC, F, P))

    A = jax.random.normal(key, (2048, 2048), dtype=jnp.float64)
    t = timeit(lambda A: A @ A, A)
    print("2048 matmul:", t, " -> TF/s:", 2 * 2048**3 / t / 1e12)


if __name__ == "__main__":
    main()
