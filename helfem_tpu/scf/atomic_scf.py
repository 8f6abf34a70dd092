"""Atomic SCF driver (L7): HF (restricted/unrestricted) on atoms.

Mirrors the SCF loop of src/atomic/main.cpp:725-998:
  density -> J -> K [-> XC] -> F -> DIIS -> symmetry-blocked eigensolve ->
  aufbau occupations, until |dE| and the DIIS error pass convthr.

The hot path (J/K builds + batched blocked eigensolve) is jitted on device;
DIIS and occupation bookkeeping run on host over tiny matrices.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, AtomicOperators, coulomb, exchange
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
    orbE_a: np.ndarray
    orbs_a: np.ndarray  # [nang, nrad, nrad] block eigenvectors
    occ_a: np.ndarray  # [nang, nrad] occupation numbers
    orbE_b: np.ndarray | None = None
    orbs_b: np.ndarray | None = None
    occ_b: np.ndarray | None = None


def _fock_jit():
    @jax.jit
    def fock(ops: AtomicOperators, Pa, Pb, kfrac):
        P = Pa + Pb
        J = coulomb(ops, P)
        Ka = kfrac * exchange(ops, Pa)
        Kb = kfrac * exchange(ops, Pb)
        Fa = ops.H0 + J + Ka
        Fb = ops.H0 + J + Kb
        Ekin = jnp.vdot(P, ops.T)
        Enuc = jnp.vdot(P, ops.Vnuc)
        Ecoul = 0.5 * jnp.vdot(P, J)
        Exx = 0.5 * (jnp.vdot(Pa, Ka) + jnp.vdot(Pb, Kb))
        return Fa, Fb, Ekin, Enuc, Ecoul, Exx

    return fock


_FOCK = None


def _density_from_blocks(C, occ, nang, nrad):
    """P[nbf, nbf] block-diagonal from per-block orbitals and occupations."""
    Pb = jnp.einsum("apk,ak,aqk->apq", C, occ, C)
    P = jnp.zeros((nang * nrad, nang * nrad))
    for a in range(nang):
        P = jax.lax.dynamic_update_slice(P, Pb[a], (a * nrad, a * nrad))
    return P


def _aufbau(E: np.ndarray, nel: int, degeneracy_avg: bool = True) -> np.ndarray:
    """Occupations [nang, nrad] filling nel electrons into globally sorted
    levels; degenerate levels (within 1e-8) share electrons equally, which
    keeps spherical densities spherical (e.g. open p shells)."""
    nang, nrad = E.shape
    occ = np.zeros((nang, nrad))
    flat = E.ravel()
    order = np.argsort(flat, kind="stable")
    left = nel
    i = 0
    while left > 0 and i < len(order):
        # group degenerate levels
        j = i
        while j + 1 < len(order) and flat[order[j + 1]] - flat[order[i]] < 1e-8:
            j += 1
        ndeg = j - i + 1
        fill = min(left, ndeg)
        if degeneracy_avg:
            for k in range(i, j + 1):
                occ.ravel()[order[k]] = fill / ndeg
        else:
            for k in range(i, i + fill):
                occ.ravel()[order[k]] = 1.0
        left -= fill
        i = j + 1
    return occ


def scf_atom(
    basis: AtomicBasis,
    nela: int,
    nelb: int,
    maxit: int = 100,
    convthr: float = 1e-9,
    guess: str = "TF",
    kfrac: float = 1.0,
    verbose: bool = False,
    ops: AtomicOperators | None = None,
) -> SCFResult:
    """Restricted/unrestricted HF SCF (restricted-open not yet: nela>=nelb)."""
    global _FOCK
    if _FOCK is None:
        _FOCK = _fock_jit()
    if ops is None:
        ops = basis.build_operators()
    nang, nrad = basis.nang, basis.nrad

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
        Fa, Fb, Ekin, Enuc, Ecoul, Exx = _FOCK(ops, Pa, Pb, kfrac)
        Etot = float(Ekin + Enuc + Ecoul + Exx)
        dE = Etot - Eold
        Eold = Etot

        if restricted:
            err = diis.update([np.asarray(Fa)], [np.asarray(Pa)])
            (Fa_,) = diis.solve()
            Fb_ = Fa_
        else:
            err = diis.update([np.asarray(Fa), np.asarray(Fb)], [np.asarray(Pa), np.asarray(Pb)])
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
        Exc=0.0,
        orbE_a=np.sort(Ea.ravel()),
        orbs_a=np.asarray(Ca),
        occ_a=occa,
        orbE_b=None if restricted else np.sort(Eb.ravel()),
        orbs_b=None if restricted else np.asarray(Cb),
        occ_b=None if restricted else occb,
    )
