"""Checkpointing (L8).

npz-based replacement for the reference's HDF5 Checkpoint class
(src/general/checkpoint.{cpp,h}): serializes the basis-set definition plus
orbitals/occupations/energies so calculations can restart, including warm
starts in a DIFFERENT basis via cross-basis overlap projection (the
reference's --load path, src/atomic/main.cpp:508-609).
"""

import numpy as np

__all__ = [
    "save_atomic", "load_atomic",
    "save_diatomic", "load_diatomic",
    "save_sadatom", "load_sadatom",
    "cross_radial_overlap", "project_orbitals",
]


def _opt(x):
    return x if x is not None else np.zeros(0)


def save_atomic(path: str, basis, res) -> None:
    np.savez(
        path,
        kind="atomic",
        Z=basis.Z, lmax=basis.lmax, mmax=basis.mmax, rmax=basis.rmax,
        nelem=basis.nelem, nnodes=basis.nnodes, nquad=basis.nquad,
        igrid=basis.igrid, zexp=basis.zexp, primbas=basis.primbas,
        finitenuc=basis.finitenuc, Rrms=basis.Rrms, nelem0=basis.nelem0,
        igrid0=basis.igrid0, zexp0=basis.zexp0, Zl=basis.Zl, Zr=basis.Zr,
        Rmid=basis.Rmid, conf_boundary=basis.conf_boundary,
        converged=res.converged, E=res.E,
        orbE_a=res.orbE_a, orbs_a=res.orbs_a, occ_a=res.occ_a,
        orbE_b=_opt(res.orbE_b), orbs_b=_opt(res.orbs_b), occ_b=_opt(res.occ_b),
    )


def load_atomic(path: str):
    """Returns (basis, data-dict)."""
    from helfem_tpu.models.atomic import AtomicBasis

    d = np.load(path, allow_pickle=False)
    basis = AtomicBasis(
        Z=int(d["Z"]), lmax=int(d["lmax"]), mmax=int(d["mmax"]),
        rmax=float(d["rmax"]), nelem=int(d["nelem"]), nnodes=int(d["nnodes"]),
        nquad=int(d["nquad"]), igrid=int(d["igrid"]), zexp=float(d["zexp"]),
        primbas=int(d["primbas"]) if "primbas" in d else 4,
        finitenuc=str(d["finitenuc"]) if "finitenuc" in d else "point",
        Rrms=float(d["Rrms"]) if "Rrms" in d else 0.0,
        nelem0=int(d["nelem0"]) if "nelem0" in d else 0,
        igrid0=int(d["igrid0"]) if "igrid0" in d else 2,
        zexp0=float(d["zexp0"]) if "zexp0" in d else 2.0,
        Zl=int(d["Zl"]) if "Zl" in d else 0,
        Zr=int(d["Zr"]) if "Zr" in d else 0,
        Rmid=float(d["Rmid"]) if "Rmid" in d else 0.0,
        conf_boundary=float(d["conf_boundary"]) if "conf_boundary" in d else 0.0,
    )
    return basis, dict(d)


def save_diatomic(path: str, basis, res) -> None:
    """Diatomic checkpoint: basis definition + block orbitals/occupations
    (reference: HDF5 checkpoint in src/diatomic/main.cpp --save)."""
    np.savez(
        path,
        kind="diatomic",
        Z1=basis.Z1, Z2=basis.Z2, Rbond=basis.Rbond,
        lmax=np.asarray(basis.lmax, dtype=np.int64),
        rmax=basis.rmax, nelem=basis.nelem, nnodes=basis.nnodes,
        nquad=basis.nquad, igrid=basis.igrid, zexp=basis.zexp,
        primbas=basis.primbas,
        converged=res.converged, E=res.E,
        orbE_a=res.orbE_a, orbs_a=_opt(res.orbs_a), occ_a=_opt(res.occ_a),
        orbE_b=_opt(res.orbE_b), orbs_b=_opt(res.orbs_b), occ_b=_opt(res.occ_b),
    )


def load_diatomic(path: str):
    """Returns (basis, data-dict). Use density_dia(ops, orbs_a, occ_a) to
    rebuild the density and scf_diatomic(..., P0a=...) to warm-start."""
    from helfem_tpu.models.diatomic import DiatomicBasis

    d = np.load(path, allow_pickle=False)
    basis = DiatomicBasis(
        Z1=int(d["Z1"]), Z2=int(d["Z2"]), Rbond=float(d["Rbond"]),
        lmax=tuple(int(l) for l in d["lmax"]),
        rmax=float(d["rmax"]), nelem=int(d["nelem"]), nnodes=int(d["nnodes"]),
        nquad=int(d["nquad"]), igrid=int(d["igrid"]), zexp=float(d["zexp"]),
        primbas=int(d["primbas"]) if "primbas" in d else 4,
    )
    return basis, dict(d)


def save_sadatom(path: str, basis, res) -> None:
    """Spherically-averaged-atom checkpoint (reference: gensap result files,
    src/sadatom/main.cpp)."""
    np.savez(
        path,
        kind="sadatom",
        Z=basis.Z, lmax=basis.lmax, rmax=basis.rmax,
        nelem=basis.nelem, nnodes=basis.nnodes, nquad=basis.nquad,
        igrid=basis.igrid, zexp=basis.zexp, primbas=basis.primbas,
        converged=res.converged, E=res.E,
        occs=res.occs, occs_b=_opt(res.occs_b),
        orbE=res.orbE, orbs=res.orbs, Pl=res.Pl,
        Plb=_opt(res.Plb), orbE_b=_opt(res.orbE_b), orbs_b=_opt(res.orbs_b),
    )


def load_sadatom(path: str):
    """Returns (basis, data-dict); Pl/Plb are the per-l density matrices."""
    from helfem_tpu.models.sadatom import SadAtomBasis

    d = np.load(path, allow_pickle=False)
    basis = SadAtomBasis(
        Z=int(d["Z"]), lmax=int(d["lmax"]), rmax=float(d["rmax"]),
        nelem=int(d["nelem"]), nnodes=int(d["nnodes"]), nquad=int(d["nquad"]),
        igrid=int(d["igrid"]), zexp=float(d["zexp"]),
        primbas=int(d["primbas"]) if "primbas" in d else 4,
    )
    return basis, dict(d)


def cross_radial_overlap(rb_new, rb_old) -> np.ndarray:
    """<B_i^new | B_j^old> between two radial bases on different element
    grids, by overlap-restricted quadrature (reference:
    RadialBasis::radial_integral(rh,...), libhelfem/src/RadialBasis.cpp:211-309)."""
    from helfem_tpu.ops.quadrature import chebyshev

    nq = max(rb_new.nquad, rb_old.nquad)
    xq, wq = chebyshev(nq)
    fa, fb = rb_new.fem, rb_old.fem
    S = np.zeros((fa.nbf + 1, fb.nbf + 1))
    for ie in range(fa.nelem):
        a0, a1 = fa.bval[ie], fa.bval[ie + 1]
        for je in range(fb.nelem):
            b0, b1 = fb.bval[je], fb.bval[je + 1]
            lo, hi = max(a0, b0), min(a1, b1)
            if hi <= lo:
                continue
            mid, hl = 0.5 * (hi + lo), 0.5 * (hi - lo)
            r = mid + hl * xq
            xa = (r - fa.mids[ie]) / (0.5 * fa.lengths[ie])
            xb = (r - fb.mids[je]) / (0.5 * fb.lengths[je])
            Ba = fa.eval_element(ie, xa, 0)[0]
            Bb = fb.eval_element(je, xb, 0)[0]
            blk = np.einsum("qi,q,qj->ij", Ba, wq * hl, Bb)
            S[np.ix_(fa.gidx[ie], fb.gidx[je])] += blk
    return S[: fa.nbf, : fb.nbf]


def warm_start_density(basis_new, basis_old, d: dict):
    """(P0a, P0b) warm-start densities in the NEW atomic basis from a loaded
    checkpoint dict: old block orbitals are cross-projected per (l,m) shell
    and contracted with the stored occupations (the reference's --load
    orbital-projection restart, src/atomic/main.cpp:507-609). P0b is None
    for restricted checkpoints. Requires per-(l,m) blocks (symm=2 runs)."""
    nang_old = len(basis_old.lval)
    if d["orbs_a"].shape[0] != nang_old:
        raise ValueError("checkpoint was not written with (l,m) symmetry blocks")
    new_shell = {
        (int(l), int(m)): a
        for a, (l, m) in enumerate(zip(basis_new.lval, basis_new.mval))
    }
    nrad, nbf = basis_new.nrad, basis_new.nbf

    def build(C_blocks, occ):
        Cp = project_orbitals(basis_new, basis_old, C_blocks, basis_new.rb.overlap())
        P = np.zeros((nbf, nbf))
        for a_old in range(nang_old):
            key = (int(basis_old.lval[a_old]), int(basis_old.mval[a_old]))
            a_new = new_shell.get(key)
            if a_new is None:
                continue
            Pblk = np.einsum("pk,k,qk->pq", Cp[a_old], occ[a_old], Cp[a_old])
            sl = slice(a_new * nrad, (a_new + 1) * nrad)
            P[sl, sl] = Pblk
        return P

    P0a = build(d["orbs_a"], d["occ_a"])
    P0b = None
    if d["orbs_b"].size:
        P0b = build(d["orbs_b"], d["occ_b"])
    return P0a, P0b


def project_orbitals(basis_new, basis_old, C_old_blocks, S_new: np.ndarray):
    """Project old orbitals into the new basis: C1 = S11^-1 S12 C2, followed
    by S-orthonormalization by the caller (reference: main.cpp:565-599).

    Works per angular shell (shells must match in (l,m))."""
    S12_rad = cross_radial_overlap(basis_new.rb, basis_old.rb)
    S11_rad = basis_new.rb.overlap()
    proj = np.linalg.solve(S11_rad, S12_rad)
    return np.einsum("pq,aqk->apk", proj, C_old_blocks)
