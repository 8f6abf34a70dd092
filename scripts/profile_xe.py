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

from helfem_tpu.models.atomic import AtomicBasis, coulomb, exchange
from helfem_tpu.utils.linalg import eig_gsym_lm


def _sync(out):
    """True synchronization: block_until_ready on the axon tunnel can
    return before the work is done; a scalar host readback cannot."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, n=5):
    """Warm per-call time with VARIED inputs each rep (repeated identical
    dispatches can be served from caches) and a per-rep readback sync."""
    variants = [tuple(a * (1.0 + i * 1e-9) for a in args) for i in range(n)]
    jax.block_until_ready(variants)
    _sync(fn(*args))
    t0 = time.perf_counter()
    for v in variants:
        _sync(fn(*v))
    return (time.perf_counter() - t0) / n


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

    F = ops.H0 + jJ(P) + jK(P)
    print("J:", timeit(jJ, P))
    print("K:", timeit(jK, P))
    print("eig_blocks:", timeit(jE, F))
    print("commutator:", timeit(jC, F, P))

    A = jax.random.normal(key, (2048, 2048), dtype=jnp.float64)
    t = timeit(lambda A: A @ A, A)
    print("2048 matmul:", t, " -> TF/s:", 2 * 2048**3 / t / 1e12)


if __name__ == "__main__":
    main()
