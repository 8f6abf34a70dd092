"""Pallas A/B ablation: can a hand-written TPU kernel beat XLA's f64
emulation on the exchange-build's dominant primitive (large matmuls)?

Pallas on TPU exposes f32/bf16/int8/fp8 only -- there is no f64 tile type
(pallas_guide.md, tiling table), so ANY Pallas implementation of the f64
hot path must emulate doubles from f32 pairs. This script measures the
three candidate operating points on one chip:

  1. XLA f64 matmul           -- the emulation the whole framework rides on
  2. Pallas f32 tiled matmul  -- the raw speed-of-light for MXU f32
  3. Pallas double-word (hi+lo f32) matmul -- 3 MXU dots per tile, the
     cheapest "more precision than f32" scheme; its ACCURACY is measured
     against the f64 product to show why it cannot replace the emulation
     (f32 accumulators lose ~sqrt(K) * 2^-24 relative, ~1e-5 at K=2048,
     vs the ~1e-12 the physics needs; an exact Ozaki-style split needs
     ~10 slices = 50+ MXU passes, which lands at or below the measured
     XLA-f64 envelope anyway).

Run on the TPU:  python scripts/pallas_f64_ablation.py [N]
Prints one JSON line with TFLOP/s for each variant and the dd error.
"""

import functools
import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _matmul_kernel(a_ref, b_ref, o_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # precision=HIGHEST: without it the MXU runs its default bf16-input
    # pass and the "f32" kernel is really bf16 accuracy (measured 2.3e-3
    # max rel err on chip in round 3 -- the round-3 advisor finding)
    o_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def pallas_matmul_f32(a, b, tm=512, tn=512, tk=512):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        _matmul_kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(m // tm, n // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
    )(a, b)


def _dd_kernel(ah_ref, al_ref, bh_ref, bl_ref, o_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    ah, al = ah_ref[:], al_ref[:]
    bh, bl = bh_ref[:], bl_ref[:]
    hi = jax.lax.Precision.HIGHEST  # true f32 MXU passes (see _matmul_kernel)
    o_ref[:] += (
        jnp.dot(ah, bh, preferred_element_type=jnp.float32, precision=hi)
        + jnp.dot(ah, bl, preferred_element_type=jnp.float32, precision=hi)
        + jnp.dot(al, bh, preferred_element_type=jnp.float32, precision=hi)
    )


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def pallas_matmul_dd(ah, al, bh, bl, tm=512, tn=512, tk=512):
    """Double-word (hi+lo f32) matmul: 3 MXU dots per tile."""
    m, k = ah.shape
    _, n = bh.shape
    spec_a = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk))
    spec_b = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j))
    return pl.pallas_call(
        _dd_kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(m // tm, n // tn, k // tk),
        in_specs=[spec_a, spec_a, spec_b, spec_b],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
    )(ah, al, bh, bl)


def split_dd(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timeit  # shared honest-timing methodology


CHAIN = 8  # matmuls per executable: amortizes the ~28 ms dispatch floor
# (round-3 advisor finding: at n=2048 a single dispatch wall equals the
# dispatch floor, so single-call "tflops" measured latency, not compute)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    a64 = jnp.asarray(rng.standard_normal((n, n)))
    b64 = jnp.asarray(rng.standard_normal((n, n)))
    a32, b32 = a64.astype(jnp.float32), b64.astype(jnp.float32)
    ah, al = split_dd(a64)
    bh, bl = split_dd(b64)
    flops = 2.0 * n**3
    s = 1.0 / np.sqrt(n)  # keeps chained products O(1)

    @jax.jit
    def f64_chain(a, b):
        x = a
        for _ in range(CHAIN):
            x = (x @ b) * s
        return x

    @jax.jit
    def p32_chain(a, b):
        x = a
        for _ in range(CHAIN):
            x = pallas_matmul_f32(x, b) * jnp.float32(s)
        return x

    @jax.jit
    def dd_chain(ah, al, bh, bl):
        # timing chain only: the single-word f32 output re-enters as the
        # hi word with lo = 0 (3 MXU dots per link either way)
        x, xl = ah, al
        for _ in range(CHAIN):
            x = pallas_matmul_dd(x, xl, bh, bl) * jnp.float32(s)
            xl = jnp.zeros_like(x)
        return x

    t_f64 = timeit(f64_chain, a64, b64) / CHAIN
    ref = np.asarray(jax.jit(lambda a, b: a @ b)(a64, b64))

    t_p32 = timeit(p32_chain, a32, b32) / CHAIN
    t_dd = timeit(dd_chain, ah, al, bh, bl) / CHAIN
    dd = np.asarray(pallas_matmul_dd(ah, al, bh, bl))
    f32 = np.asarray(pallas_matmul_f32(a32, b32))
    scale = np.abs(ref).max()
    print(json.dumps({
        "n": n,
        "chain": CHAIN,
        "xla_f64_tflops": round(flops / t_f64 / 1e12, 3),
        "pallas_f32_tflops": round(flops / t_p32 / 1e12, 3),
        "pallas_dd_tflops_logical": round(flops / t_dd / 1e12, 3),
        "pallas_f32_max_rel_err": float(np.abs(f32 - ref).max() / scale),
        "pallas_dd_max_rel_err": float(np.abs(dd - ref).max() / scale),
        "f64_target_rel_err": 1e-12,
    }))


if __name__ == "__main__":
    main()
