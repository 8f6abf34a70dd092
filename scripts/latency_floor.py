"""Quantify the emulated-f64 latency floor on the TPU backend.

Three questions decide how much headroom the SCF hot loop has left:

1. Achieved TF/s of a single f64 matmul vs size (128..2048): where does
   the MXU-emulation envelope saturate, and what does a sub-tile op cost?
2. Per-op cost INSIDE one executable: a lax.scan of k dependent dots of
   fixed size -- if (time(k) - time(1)) / (k - 1) is flat vs size, the
   floor is per-op issue latency, not FLOPs or bytes; fusing more work
   per op (bigger batched channels) is then the only lever.
3. Dispatch overhead: time of an empty-ish jitted program (one add),
   i.e. the per-dispatch tunnel cost the fused SCF chunks amortize.

Honest timing on the axon tunnel: block_until_ready is a NO-OP there, so
every rep does a scalar host readback of the result, with varied inputs
per rep (identical dispatches can be served from a cache).

Run on the TPU:  python scripts/latency_floor.py
Prints one JSON line.
"""

import functools
import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timeit  # shared honest-timing methodology


@functools.partial(jax.jit, static_argnames=("k",))
def chain(a, x, k):
    """k dependent dots inside ONE executable (scan body = one dot)."""
    def body(c, _):
        return a @ c, None
    y, _ = jax.lax.scan(body, x, None, length=k)
    return y


def main():
    out = {"backend": jax.default_backend()}

    # 1. single f64 matmul envelope vs size
    env = {}
    rng = np.random.default_rng(0)
    for n in (128, 256, 512, 1024, 2048):
        a = jnp.asarray(rng.standard_normal((n, n)))
        t = timeit(jax.jit(lambda x: x @ x), a)
        env[str(n)] = {"s": round(t, 5), "tflops": round(2 * n**3 / t / 1e12, 4)}
    out["f64_matmul"] = env

    # 2. in-program per-op latency: chained dots, k=1 vs k=16
    per_op = {}
    for n in (128, 256, 512, 1024):
        a = jnp.asarray(rng.standard_normal((n, n)) * (0.9 / n**0.5))
        x = jnp.asarray(rng.standard_normal((n, n)))
        t1 = timeit(lambda a_, x_: chain(a_, x_, 1), a, x)
        t16 = timeit(lambda a_, x_: chain(a_, x_, 16), a, x)
        per_op[str(n)] = {
            "k1_s": round(t1, 5),
            "k16_s": round(t16, 5),
            "per_op_ms": round((t16 - t1) / 15 * 1e3, 3),
        }
    out["chained_dots"] = per_op

    # 3. bare dispatch cost (one elementwise add + readback)
    a = jnp.ones((8, 8))
    out["dispatch_s"] = round(timeit(jax.jit(lambda x: x + 1.0), a), 5)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
