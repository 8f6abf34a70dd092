"""TPU-backend range check for the JAX-native XC functionals.

The TPU emulates f64 with the f32 EXPONENT range (~1e+-38): any intermediate
outside that range becomes 0/inf even though the f64 *values* are fine on
CPU. The functional implementations in helfem_tpu.ops.xc are therefore
written so that every primal intermediate and first-derivative cotangent
stays inside the range for densities above the SCF threshold (n >= 1e-12).
This script sweeps each catalog functional's energy and potentials over an
extreme but physical input grid ON THE AMBIENT BACKEND and reports any
non-finite outputs. Run it in the TPU environment (no env overrides):

    python scripts/check_xc_tpu.py
"""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    from helfem_tpu.ops.xc import _CATALOG, xc_eval

    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    npts = 512
    # densities from the SCF mask threshold up; gradients from exponential
    # tails (sigma ~ (zeta n)^2) to cusp-like (sigma >> n^2); tau >= tw
    n = 10 ** rng.uniform(-12, 2, npts)
    ra = jnp.asarray(n)
    rb = jnp.asarray(n * rng.uniform(0.0, 1.0, npts))
    za = 10 ** rng.uniform(-2, 3, npts)
    zb = 10 ** rng.uniform(-2, 3, npts)
    ga, gb = jnp.asarray(za) * ra, jnp.asarray(zb) * rb
    saa, sab, sbb = ga * ga, ga * gb, gb * gb
    # include exact-zero sigma points (density extrema)
    saa = saa.at[:8].set(0.0)
    sab = sab.at[:8].set(0.0)
    sbb = sbb.at[:8].set(0.0)
    cfac = 0.3 * (3.0 * np.pi**2) ** (2.0 / 3.0)
    ta = saa / (8.0 * jnp.maximum(ra, 1e-30)) * 1.2 + cfac * ra ** (5.0 / 3.0)
    tb = sbb / (8.0 * jnp.maximum(rb, 1e-30)) * 1.2 + cfac * rb ** (5.0 / 3.0)
    la = 0.5 * ta
    lb = 0.5 * tb

    failures = 0
    for name, f in sorted(_CATALOG.items()):
        kw = {}
        if f.family in ("mgga", "mggal"):
            kw = {"ta": ta, "tb": tb}
        if f.family == "mggal":
            kw.update(la=la, lb=lb)
        out = xc_eval((f,), ra, rb, saa, sab, sbb, 1e-12, **kw)
        bad = {}
        labels = ["e", "vra", "vrb", "vsaa", "vsab", "vsbb", "vta", "vtb", "vla", "vlb"]
        for lab, arr in zip(labels, out):
            nb = int(jnp.sum(~jnp.isfinite(arr)))
            if nb:
                bad[lab] = nb
        status = "OK" if not bad else f"FAIL {bad}"
        if bad:
            failures += 1
        print(f"{name:<16s} {status}")
    if failures:
        raise SystemExit(f"{failures} functionals produced non-finite outputs")
    print("all functionals finite on this backend")


if __name__ == "__main__":
    main()
