"""Stage-level profile of the occupied-factorized diatomic exchange
(`exchange_dia_occ`) at the reference-converged N2 discretization.

Times PREFIX pipelines of the per-chunk computation (XLA dead-code
elimination removes everything downstream of each prefix's returned
reduction), so stage cost = difference of consecutive prefixes:

  factors : Gaunt transforms U/V + the stacked u/v cross factors + cross
  gathers : assembly-window AW + the b<=c pair-triangle takes A0/A1
  rg      : the pair rank product Rg (the 2x2 family outer product)
  kd      : the in-element TEI matmul (tK x Rgv)

Usage: python scripts/profile_kocc.py [lmax] [nnodes] [reps]
"""
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

_d = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _d)
sys.path.insert(0, os.path.dirname(_d))

from _timing import sync, timeit

from helfem_tpu.models import diatomic as D


def make_prefix(ops, basis, no, stage):
    """exchange_dia_occ's scan with the per-chunk body truncated at
    `stage`; mirrors models/diatomic.py:exchange_dia_occ."""
    nang = ops.GmLM.shape[-1]
    nrad = ops.shellmask.shape[-1]
    nelem, nprim = ops.gidx.shape
    from helfem_tpu.models.atomic import _assembler

    A = _assembler(ops.gidx, nrad)

    def left(d):
        return jnp.einsum("tfip,fpn->tfin", d, A)

    # identical P-independent tables to exchange_dia_occ
    CL2 = jnp.stack([left(ops.dQ0), left(ops.dQ2)], axis=1)

    def rsl(d):
        G = jnp.einsum("tfjm,fjx->tfmx", jnp.einsum("tfjq,fqm->tfjm", d, A), A)
        return jnp.cumsum(G, axis=1) - G

    SS2T = jnp.stack([rsl(ops.dP0), rsl(ops.dP2)], axis=1).transpose(0, 1, 2, 4, 3)
    sgnF = jnp.asarray([[1.0, -1.0], [-1.0, 1.0]])

    bP, cP = np.triu_indices(nang)
    pair_flat = jnp.asarray((bP * nang + cP).astype(np.int32))
    npair = int(bP.shape[0])

    nlm = int(ops.step_ilm.shape[0])
    per_chan = (100.0 * 4.0 * nang * nang * nelem * nprim * nprim
                + 32.0 * 4.0 * nang * nelem * nprim * no)
    budget = float(os.environ.get("HELFEM_EXCHANGE_HBM", 4e9))
    cap = int(os.environ.get("HELFEM_EXCHANGE_STEPS", 64))
    gs = max(1, min(nlm, cap, int(budget // max(per_chan, 1.0))))
    npad = (-nlm) % gs
    wv = jnp.concatenate([jnp.ones(nlm), jnp.zeros(npad)])
    stepxs = tuple(
        jnp.pad(x, (0, npad))
        for x in (ops.step_ilm, ops.step_sp, ops.step_sm, ops.step_wm)
    ) + (wv,)
    xs = tuple(x.reshape((nlm + npad) // gs, gs) for x in stepxs)

    def chunk(C4p, ilm, sp, sm, wm, w):
        fac = ops.LMfac[ilm]
        s2 = jnp.stack([sp, sm], axis=1)
        w2 = (w * fac)[:, None] * jnp.stack([jnp.ones_like(wm), wm], axis=1)
        Gq = jnp.stack([ops.GmLM[s2], ops.GpLM[s2]], axis=1)
        U = jnp.einsum("sqtba,ano->sqtbno", Gq, C4p)
        WW = jnp.stack([w2[:, None, :, None, None, None] * U, U], axis=1)
        ul = jnp.einsum("sqein,sqtbno->sqtebio", CL2[ilm], WW[:, 0])
        ud = ul[:, 0] - ul[:, 1]
        vq = jnp.einsum("sqexm,sqtcmo->sqtecox", SS2T[ilm], WW[:, 1])
        vd = vq[:, 0] - vq[:, 1]
        cross = jnp.einsum("stebio,stecox->ebicx", ud, vd)
        if stage == "factors":
            return jnp.sum(cross)
        AW = jnp.einsum("ein,skqtbno->skqtebio", A, WW)
        if stage == "gathers":
            return jnp.sum(AW) + jnp.sum(cross)
        # full-grid rank GEMM + pair-triangle gather (see exchange_dia_occ)
        Rgf = jnp.einsum("sqtebio,srteclo->sqrebcil", AW[:, 0], AW[:, 1])
        if stage == "rg":
            return jnp.sum(Rgf) + jnp.sum(cross)
        Rgp = Rgf.reshape(*Rgf.shape[:4], nang * nang, nprim * nprim)
        Rgv = jnp.take(Rgp, pair_flat, axis=4)
        tK = ops.teiK[ilm].reshape(-1, 2, 2, *ops.teiK.shape[2:])
        tK = tK * sgnF[None, :, :, None, None, None]
        Kd = jnp.einsum("sqrexy,sqrePy->Pex", tK, Rgv)
        return jnp.sum(Kd) + jnp.sum(cross)

    @jax.jit
    def run(C4p):
        def body(acc, xs_):
            return acc + chunk(C4p, *xs_), None

        out, _ = jax.lax.scan(body, jnp.asarray(0.0), xs)
        return out

    return run, gs


def main():
    lmax = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nnodes = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    basis = D.DiatomicBasis(Z1=7, Z2=7, Rbond=2.068, lmax=(lmax,) * 3,
                            rmax=40.0, nelem=5, nnodes=nnodes)
    t0 = time.perf_counter()
    ops = basis.build_operators()
    print("setup:", round(time.perf_counter() - t0, 1), "nbf:", basis.nbf)
    no = 9
    key = jax.random.PRNGKey(0)
    C4p = jax.random.normal(key, (basis.nang, basis.nrad + 1, no)) * 0.1

    prev = 0.0
    for stage in ("factors", "gathers", "rg", "kd"):
        run, gs = make_prefix(ops, basis, no, stage)
        dt = timeit(run, C4p, reps=reps)
        print(f"{stage:8s} prefix {dt:7.2f} s   stage {dt - prev:7.2f} s"
              f"   (gs={gs})")
        prev = dt

    # reference: the real K_occ call
    jK = jax.jit(D.exchange_dia_occ)
    Co = jax.random.normal(key, (basis.nbf, no)) * 0.1
    dt = timeit(lambda C: jK(ops, C), Co, reps=reps)
    print(f"exchange_dia_occ full {dt:7.2f} s")


if __name__ == "__main__":
    main()
