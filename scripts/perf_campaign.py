"""One-shot on-chip measurement campaign: everything the README
performance section cites, collected by a SINGLE process (one device init,
no parallel clients — multiple clients through the shared axon tunnel
queue-wedge each other).

Stages (each appended to the JSON as soon as it completes, so a partial
run still yields numbers):
  1. latency_floor   — f64 matmul envelope, in-program per-op latency,
                       dispatch cost (scripts/latency_floor.py logic)
  2. pallas_ablation — XLA f64 vs Pallas f32 vs Pallas double-word matmul
                       (scripts/pallas_f64_ablation.py logic)
  3. xe_stages       — Xe lmax=3 J/K/eigh/commutator per-stage walls
  4. n2_stages       — N2 lmax=(6,6) J/K_occ/eig per-stage walls
  5. n2_12_stages    — N2 lmax=12 nnodes=15 (reference-converged) stages

Run on the TPU:  python scripts/perf_campaign.py [out.json]
Progress lines go to stderr; the JSON is (re)written after every stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/perf_campaign.json"
RESULTS = {"backend": None, "stages": {}}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def save(name, data):
    RESULTS["stages"][name] = data
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    log(f"[{time.strftime('%H:%M:%S')}] {name}: {json.dumps(data)[:400]}")


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import sync as _sync, timeit  # noqa: E402 (shared methodology)


def stage_latency_floor():
    import functools

    rng = np.random.default_rng(0)
    env = {}
    for n in (128, 256, 512, 1024, 2048):
        a = jnp.asarray(rng.standard_normal((n, n)))
        t = timeit(jax.jit(lambda x: x @ x), a)
        env[str(n)] = {"s": round(t, 5), "tflops": round(2 * n**3 / t / 1e12, 4)}

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, x, k):
        def body(c, _):
            return a @ c, None

        y, _ = jax.lax.scan(body, x, None, length=k)
        return y

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
    disp = timeit(jax.jit(lambda x: x + 1.0), jnp.ones((8, 8)))
    return {"f64_matmul": env, "chained_dots": per_op, "dispatch_s": round(disp, 5)}


def stage_pallas():
    import functools

    from jax.experimental import pallas as pl

    interp = jax.default_backend() == "cpu"

    def _mm_kernel(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
    def pmm32(a, b, tm=512, tn=512, tk=512):
        m, k = a.shape
        _, n = b.shape
        return pl.pallas_call(
            _mm_kernel,
            interpret=interp,
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
        o_ref[:] += (
            jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            + jnp.dot(al, bh, preferred_element_type=jnp.float32)
        )

    @functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
    def pmmdd(ah, al, bh, bl, tm=512, tn=512, tk=512):
        m, k = ah.shape
        _, n = bh.shape
        spec_a = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk))
        spec_b = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j))
        return pl.pallas_call(
            _dd_kernel,
            interpret=interp,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(m // tm, n // tn, k // tk),
            in_specs=[spec_a, spec_a, spec_b, spec_b],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        )(ah, al, bh, bl)

    n = 2048
    rng = np.random.default_rng(0)
    a64 = jnp.asarray(rng.standard_normal((n, n)))
    b64 = jnp.asarray(rng.standard_normal((n, n)))
    a32, b32 = a64.astype(jnp.float32), b64.astype(jnp.float32)

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)

    ah, al = split(a64)
    bh, bl = split(b64)
    flops = 2.0 * n**3
    f64mm = jax.jit(lambda a, b: a @ b)
    t_f64 = timeit(f64mm, a64, b64)
    ref = np.asarray(f64mm(a64, b64))
    t32 = timeit(pmm32, a32, b32)
    tdd = timeit(pmmdd, ah, al, bh, bl)
    f32 = np.asarray(pmm32(a32, b32))
    dd = np.asarray(pmmdd(ah, al, bh, bl))
    scale = np.abs(ref).max()
    return {
        "n": n,
        "xla_f64_tflops": round(flops / t_f64 / 1e12, 3),
        "pallas_f32_tflops": round(flops / t32 / 1e12, 3),
        "pallas_dd_tflops_logical": round(flops / tdd / 1e12, 3),
        "pallas_f32_max_rel_err": float(np.abs(f32 - ref).max() / scale),
        "pallas_dd_max_rel_err": float(np.abs(dd - ref).max() / scale),
    }


def stage_xe():
    from helfem_tpu.models.atomic import (AtomicBasis, channel_diag, coulomb,
                                          exchange, exchange_bd)
    from helfem_tpu.utils.linalg import eig_gsym_lm

    basis = AtomicBasis(Z=54, lmax=3, mmax=3, rmax=40.0, nelem=8, nnodes=12, zexp=2.5)
    t0 = time.perf_counter()
    ops = basis.build_operators()
    setup = time.perf_counter() - t0
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (basis.nbf, basis.nbf), dtype=jnp.float64)
    P = 0.5 * (P + P.T) * 1e-2
    jJ_, jK_, jE_ = jax.jit(coulomb), jax.jit(exchange), jax.jit(eig_gsym_lm)
    jJ = lambda P: jJ_(ops, P)
    jK = lambda P: jK_(ops, P)
    jE = lambda F: jE_(F, ops.Sinvh_rad)
    jC = jax.jit(lambda F, P: F @ P - P @ F)
    # the SCF hot path under (l,m) symmetry blocks: block-diagonal-density
    # collapsed exchange (one dispatch, no L-chunked scan)
    jKbd_ = jax.jit(lambda o, P: exchange_bd(o, channel_diag(P, basis.nang,
                                                             basis.nrad)))
    jKbd = lambda P: jKbd_(ops, P)
    t0 = time.perf_counter()
    F = ops.H0 + jJ(P) + jK(P)
    _sync(F)
    compile_jk = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(jKbd(P))
    compile_kbd = time.perf_counter() - t0
    return {
        "nbf": int(basis.nbf),
        "setup_s": round(setup, 2),
        "compile_jk_s": round(compile_jk, 2),
        "compile_kbd_s": round(compile_kbd, 2),
        "J_s": round(timeit(jJ, P), 4),
        "K_s": round(timeit(jK, P), 4),
        "K_bd_s": round(timeit(jKbd, P), 4),
        "eig_s": round(timeit(jE, F), 4),
        "commutator_s": round(timeit(jC, F, P), 4),
    }


def _n2_stages(lmax, nnodes, rmax, dense_K):
    from helfem_tpu.models.diatomic import (
        DiatomicBasis,
        coulomb_dia,
        exchange_dia,
        exchange_dia_occ,
    )
    from helfem_tpu.scf.diatomic_scf import eig_blocks_dia

    lv = (lmax,) * 3 if lmax > 6 else (lmax, lmax)
    t0 = time.perf_counter()
    basis = DiatomicBasis(Z1=7, Z2=7, Rbond=2.0743, lmax=lv, rmax=rmax,
                          nelem=5, nnodes=nnodes)
    ops = basis.build_operators()
    setup = time.perf_counter() - t0
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (basis.nbf, basis.nbf), dtype=jnp.float64)
    P = 0.5 * (P + P.T) * 1e-2
    # tight two-tier width the SCF driver actually uses for N2 (7 + 2)
    Co = jax.random.normal(key, (basis.nbf, 9), dtype=jnp.float64) * 0.1
    jJ_ = jax.jit(coulomb_dia)
    jKo_ = jax.jit(exchange_dia_occ)
    jJ = lambda P: jJ_(ops, P)
    jKo = lambda C: jKo_(ops, C)
    out = {"nbf": int(basis.nbf), "nsteps": int(ops.step_ilm.shape[0]),
           "setup_s": round(setup, 2)}
    t0 = time.perf_counter()
    _sync(jKo(Co))
    out["K_occ_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    Jm = jJ(P)
    _sync(Jm)
    out["J_compile_s"] = round(time.perf_counter() - t0, 2)
    out["K_occ_s"] = round(timeit(jKo, Co), 4)
    out["J_s"] = round(timeit(jJ, P), 4)
    if dense_K:
        jK_ = jax.jit(exchange_dia)
        jK = lambda P: jK_(ops, P)
        t0 = time.perf_counter()
        _sync(jK(P))
        out["K_dense_compile_s"] = round(time.perf_counter() - t0, 2)
        out["K_dense_s"] = round(timeit(jK, P), 4)
    F = ops.H0 + Jm
    if basis.nbf < 2000:
        jE_ = jax.jit(eig_blocks_dia)
        jE = lambda F: jE_(ops, F)
        out["eig_device_s"] = round(timeit(jE, F), 4)
    else:
        # big basis: the on-device eigh at these block sizes CRASHES the
        # TPU worker (measured 2026-08-21, even workspace-chunked), so the
        # SCF runs the hybrid host path -- time BOTH halves: the host
        # LAPACK solve (the cold fallback, pays double tunnel transfers)
        # and the matmul-only warm refinement that replaces it on
        # certificate-passing iterations (scf/diatomic_scf.py:eig_full)
        from helfem_tpu.scf.diatomic_scf import (_dia_host_warm,
                                                 eig_blocks_dia_host)

        Fn = np.asarray(F)
        t0 = time.perf_counter()
        E_h, C_h, V_h = eig_blocks_dia_host(ops, Fn, return_v=True)
        out["eig_host_s"] = round(time.perf_counter() - t0, 4)
        Vd = jnp.asarray(V_h)
        t0 = time.perf_counter()
        E_w, C_w, V_w, off = _dia_host_warm(ops, F, Vd)
        _sync(off)
        out["eig_warm_compile_s"] = round(time.perf_counter() - t0, 2)
        out["eig_warm_s"] = round(
            timeit(lambda F_: _dia_host_warm(ops, F_, Vd)[3], F), 4)
        out["eig_warm_certificate_off"] = float(off)
    return out


def main():
    RESULTS["backend"] = jax.default_backend()
    # tiny op first: device init + canary (this is where a wedged tunnel
    # hangs; everything after runs on a live chip)
    t0 = time.perf_counter()
    x = jnp.ones((128, 128))
    _sync(x @ x)
    save("device_init", {"s": round(time.perf_counter() - t0, 1)})
    for name, fn in [
        ("latency_floor", stage_latency_floor),
        ("pallas_ablation", stage_pallas),
        ("xe_stages", stage_xe),
        ("n2_stages", lambda: _n2_stages(6, 8, 25.0, dense_K=True)),
        ("n2_12_stages", lambda: _n2_stages(12, 15, 40.0, dense_K=False)),
    ]:
        try:
            save(name, fn())
        except Exception as e:  # noqa: BLE001 - keep collecting
            save(name, {"error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
