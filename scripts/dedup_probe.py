"""Characterize the axon tunnel's dispatch dedup/memoization.

A fixed-arg loop over one jitted 2048^2 f64 matmul measured an impossible
395 TF/s on this tunnel -- something caches repeated dispatches. This probe
pins down the cache key so we know which timings to trust:

  t_fixed        same device buffer every rep
  t_same_content fresh buffers (host->device each rep), identical values
  t_varied       fresh buffers, distinct values

  - t_fixed << t_varied, t_same_content ~ t_varied:
      identity-keyed memo -> only fixed-arg microbenchmarks lie; SCF loops
      (fresh buffers each call) and bench warm repeats are honest.
  - t_same_content ~ t_fixed << t_varied:
      content-keyed dedup -> ANY replayed computation (bench warm repeats,
      gensap's timed second solve) can be served from cache and must be
      perturbed to measure honestly.

Run on the TPU: python scripts/dedup_probe.py [N] [reps]
"""
import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.default_rng(0)
    a_host = rng.standard_normal((n, n))
    A = jnp.asarray(a_host)
    jM = jax.jit(lambda a: a @ a)
    jax.block_until_ready(jM(A))
    flops = 2.0 * n**3

    def run(make_arg, readback=True):
        """readback=True forces a scalar device->host transfer per rep:
        block_until_ready on the axon tunnel can return before the work
        is done (measured 345 'TF/s' on an f64 matmul), but a host float
        of the result cannot be faked."""
        args = [make_arg(i) for i in range(reps)]
        jax.block_until_ready(args)
        acc = 0.0
        t0 = time.perf_counter()
        for a in args:
            out = jM(a)
            if readback:
                acc += float(out.ravel()[0])
            else:
                jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        return dt, acc

    t_block, _ = run(lambda i: jnp.asarray(a_host) * (1.0 + (i + 1) * 1e-9),
                     readback=False)
    t_fixed, _ = run(lambda i: A)
    t_same, _ = run(lambda i: jnp.asarray(a_host))  # fresh buffer, same values
    t_varied, _ = run(lambda i: jnp.asarray(a_host) * (1.0 + (i + 1) * 1e-9))

    print(json.dumps({
        "n": n,
        "t_varied_blockonly_s": round(t_block, 5),
        "t_fixed_s": round(t_fixed, 5),
        "t_same_content_s": round(t_same, 5),
        "t_varied_s": round(t_varied, 5),
        "tflops_fixed": round(flops / t_fixed / 1e12, 3),
        "tflops_same_content": round(flops / t_same / 1e12, 3),
        "tflops_varied": round(flops / t_varied / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
