"""`helfem-diatomic-cpl`: completeness/importance scan of a diatomic FEM
basis with GTO/STO probes at the nuclei and bond midpoint
(flags mirror src/diatomic/completeness.cpp:31-38). Reads an npz checkpoint
written by the diatomic CLI (--save) and writes, per (m, l, center),

    cpl_<probe>_m<m>_l<l>_<center>.dat:  exponent  Y(alpha)  I_alpha  [I_beta]
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="helfem-diatomic-cpl", description=__doc__)
    p.add_argument("--load", required=True, help="npz checkpoint from the diatomic CLI")
    p.add_argument("--completeness", type=int, default=2, help="max probe l")
    p.add_argument("--minexp", type=float, default=1e-3)
    p.add_argument("--maxexp", type=float, default=1e6)
    p.add_argument("--nexp", type=int, default=101)
    p.add_argument("--iprobe", type=int, default=0, help="0 = GTO, 1 = STO")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from helfem_tpu.models.diatomic_cpl import (
        completeness_dia,
        full_orbitals,
        importance_dia,
    )
    from helfem_tpu.utils.checkpoint import load_diatomic

    basis, d = load_diatomic(args.load)
    kind = "GTO" if args.iprobe == 0 else "STO"
    expn = 10.0 ** np.linspace(np.log10(args.minexp), np.log10(args.maxexp), args.nexp)
    ops = basis.build_operators()
    S = np.asarray(ops.S)
    Ca = full_orbitals(ops, d["orbs_a"], d["occ_a"])
    Cb = full_orbitals(ops, d["orbs_b"], d["occ_b"]) if d["orbs_b"].size else None

    for m in sorted(set(int(x) for x in basis.mval)):
        for l in range(abs(m), args.completeness + 1):
            for center in ("left", "mid", "right"):
                Y = completeness_dia(basis, S, l, m, expn, center, kind)
                Ia = importance_dia(basis, Ca, l, m, expn, center, kind)
                cols = [expn, Y, Ia]
                if Cb is not None:
                    cols.append(importance_dia(basis, Cb, l, m, expn, center, kind))
                path = f"cpl_{kind.lower()}_m{m}_l{l}_{center}.dat"
                np.savetxt(path, np.column_stack(cols))
                print(f"m={m:+d} l={l} {center:>5s}: max Y = {Y.max():.6f}, "
                      f"max I_a = {Ia.max():.6f} -> {path}")
    return 0


if __name__ == "__main__":
    main()
