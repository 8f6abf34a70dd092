"""Shared honest-timing helpers for the measurement scripts.

On the axon TPU tunnel `jax.block_until_ready` is a NO-OP (a 2048^2 f64
matmul "finished" in 60 us) and byte-identical dispatches can be served
from a content-keyed cache. Honest wall time therefore requires BOTH a
scalar host readback of each result AND varied inputs per rep. Every
script in this directory must time through these helpers so a methodology
fix lands once.
"""

import time

import jax
import jax.numpy as jnp


def sync(out):
    """True synchronization: a scalar host readback cannot be faked."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, reps=5):
    """Warm per-call wall time with VARIED inputs each rep and a per-rep
    readback sync. The rep-i variant scales inputs by (1 + i*1e-9), so
    rep 0 intentionally differs from the warmup call's exact buffers."""
    variants = [
        tuple(a * (1.0 + (i + 1) * 1e-9) for a in args) for i in range(reps)
    ]
    jax.block_until_ready(variants)
    sync(fn(*args))  # warm/compile
    t0 = time.perf_counter()
    for v in variants:
        sync(fn(*v))
    return (time.perf_counter() - t0) / reps
