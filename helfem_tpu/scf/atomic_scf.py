"""Atomic SCF driver (L7): HF and DFT (restricted/unrestricted) on atoms.

Mirrors the SCF loop of src/atomic/main.cpp:725-998:
  density -> J -> K and/or XC -> F -> DIIS -> symmetry-blocked eigensolve ->
  aufbau occupations, until |dE| and the DIIS error pass convthr.

The hot path (J/K/XC builds + batched blocked eigensolve) is jitted on
device; DIIS and occupation bookkeeping run on host over tiny matrices.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, AtomicOperators, coulomb, exchange
from helfem_tpu.models.atomic_dft import DFTGridOps, build_dft_grid, eval_fxc
from helfem_tpu.ops.xc import parse_method
from helfem_tpu.scf.diis import DIIS
from helfem_tpu.scf.guess import potential
from helfem_tpu.utils.linalg import eig_gsym_lm

__all__ = ["scf_atom", "SCFResult"]


@dataclass
class SCFResult:
    converged: bool
    niter: int
    E: float
    Ekin: float
    Enuc: float
    Ecoul: float
    Exx: float
    Exc: float
    Nelgrid: float
    orbE_a: np.ndarray
    orbs_a: np.ndarray  # [nang, nrad, nrad] block eigenvectors
    occ_a: np.ndarray  # [nang, nrad] occupation numbers
    orbE_b: np.ndarray | None = None
    orbs_b: np.ndarray | None = None
    occ_b: np.ndarray | None = None


def make_fock(funcs, kfrac: float, nrad: int, dftthr: float = 1e-12):
    """Jitted Fock builder for a fixed method (funcs/kfrac are compile-time)."""

    @jax.jit
    def fock(ops: AtomicOperators, g, Pa, Pb):
        P = Pa + Pb
        J = coulomb(ops, P)
        Fa = ops.H0 + J
        Fb = ops.H0 + J
        Exx = 0.0
        if kfrac != 0.0:
            Ka = kfrac * exchange(ops, Pa)
            Kb = kfrac * exchange(ops, Pb)
            Fa = Fa + Ka
            Fb = Fb + Kb
            Exx = 0.5 * (jnp.vdot(Pa, Ka) + jnp.vdot(Pb, Kb))
        Exc = 0.0
        Nel = 0.0
        if funcs:
            XCa, XCb, Exc, Nel = eval_fxc(funcs, g, Pa, Pb, nrad, dftthr)
            Fa = Fa + XCa
            Fb = Fb + XCb
        Ekin = jnp.vdot(P, ops.T)
        Enuc = jnp.vdot(P, ops.Vnuc)
        Ecoul = 0.5 * jnp.vdot(P, J)
        return Fa, Fb, Ekin, Enuc, Ecoul, Exx, Exc, Nel

    return fock


def _density_from_blocks(C, occ, nang, nrad):
    """P[nbf, nbf] block-diagonal from per-block orbitals and occupations."""
    Pb = jnp.einsum("apk,ak,aqk->apq", C, occ, C)
    P = jnp.zeros((nang * nrad, nang * nrad))
    for a in range(nang):
        P = jax.lax.dynamic_update_slice(P, Pb[a], (a * nrad, a * nrad))
    return P


def _aufbau(E: np.ndarray, nel: float, degeneracy_avg: bool = True) -> np.ndarray:
    """Occupations [nang, nrad] filling nel electrons into globally sorted
    levels; degenerate levels (within 1e-8) share electrons equally, which
    keeps spherical densities spherical (e.g. open p shells)."""
    nang, nrad = E.shape
    occ = np.zeros(nang * nrad)
    flat = E.ravel()
    order = np.argsort(flat, kind="stable")
    left = float(nel)
    i = 0
    while left > 1e-12 and i < len(order):
        j = i
        while j + 1 < len(order) and flat[order[j + 1]] - flat[order[i]] < 1e-8:
            j += 1
        ndeg = j - i + 1
        fill = min(left, float(ndeg))
        for k in range(i, j + 1):
            occ[order[k]] = fill / ndeg
        left -= fill
        i = j + 1
    return occ.reshape(nang, nrad)


def scf_atom(
    basis: AtomicBasis,
    nela: int,
    nelb: int,
    method: str = "HF",
    maxit: int = 100,
    convthr: float = 1e-7,
    guess: str = "TF",
    verbose: bool = False,
    ops: AtomicOperators | None = None,
    dftthr: float = 1e-12,
) -> SCFResult:
    """Restricted/unrestricted SCF. method: 'HF', 'LDA', 'SVWN', 'PBE', or
    an 'x_func,c_func' pair of functional names."""
    if ops is None:
        ops = basis.build_operators()
    nang, nrad = basis.nang, basis.nrad
    funcs, kfrac = parse_method(method)
    g = build_dft_grid(basis) if funcs else None
    fock = make_fock(tuple(funcs), kfrac, nrad, dftthr)

    # guess
    Hg = jnp.asarray(basis.kinetic() + basis.model_potential(potential(guess, basis.Z)))
    Ea, Ca = eig_gsym_lm(Hg, ops.Sinvh_rad)
    Ea = np.asarray(Ea)
    Eb, Cb = Ea.copy(), Ca

    restricted = nela == nelb
    diis = DIIS(np.asarray(ops.S), np.kron(np.eye(nang), np.asarray(ops.Sinvh_rad)))

    Eold = 0.0
    Etot = 0.0
    converged = False
    occa = occb = None
    for it in range(1, maxit + 1):
        occa = _aufbau(Ea, nela)
        occb = occa if restricted else _aufbau(Eb, nelb)
        Pa = _density_from_blocks(Ca, jnp.asarray(occa), nang, nrad)
        Pb = Pa if restricted else _density_from_blocks(Cb, jnp.asarray(occb), nang, nrad)
        Fa, Fb, Ekin, Enuc, Ecoul, Exx, Exc, Nel = fock(ops, g, Pa, Pb)
        Etot = float(Ekin + Enuc + Ecoul + Exx + Exc)
        dE = Etot - Eold
        Eold = Etot

        if restricted:
            err = diis.update([np.asarray(Fa)], [np.asarray(Pa)])
            (Fa_,) = diis.solve()
            Fb_ = Fa_
        else:
            err = diis.update(
                [np.asarray(Fa), np.asarray(Fb)], [np.asarray(Pa), np.asarray(Pb)]
            )
            Fa_, Fb_ = diis.solve()

        if verbose:
            print(f"iter {it:3d}  E = {Etot:+.12f}  dE = {dE:+.3e}  diis = {err:.3e}")
        if err < convthr and abs(dE) < convthr and it > 1:
            converged = True
            break

        Ea, Ca = eig_gsym_lm(jnp.asarray(Fa_), ops.Sinvh_rad)
        Ea = np.asarray(Ea)
        if restricted:
            Eb, Cb = Ea, Ca
        else:
            Eb, Cb = eig_gsym_lm(jnp.asarray(Fb_), ops.Sinvh_rad)
            Eb = np.asarray(Eb)

    return SCFResult(
        converged=converged,
        niter=it,
        E=Etot,
        Ekin=float(Ekin),
        Enuc=float(Enuc),
        Ecoul=float(Ecoul),
        Exx=float(Exx),
        Exc=float(Exc),
        Nelgrid=float(Nel),
        orbE_a=np.sort(Ea.ravel()),
        orbs_a=np.asarray(Ca),
        occ_a=occa,
        orbE_b=None if restricted else np.sort(Eb.ravel()),
        orbs_b=None if restricted else np.asarray(Cb),
        occ_b=None if restricted else occb,
    )
