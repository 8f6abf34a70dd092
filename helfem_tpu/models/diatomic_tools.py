"""Diatomic auxiliary tools: general (mu, eta) quadrature for model
potentials (the reference's TwoDGrid, src/diatomic/twodquadrature.{cpp,h}),
SAP/GSZ/TF guesses from the two atoms, and density post-processing
(the diatomic_dline / diatomic_dgrid utilities,
src/diatomic/density_line.cpp, density_grid.cpp).
"""

import numpy as np

from helfem_tpu.models.diatomic import DiatomicBasis
from helfem_tpu.models.diatomic_dft import DiaGridOps, build_dia_grid
from helfem_tpu.ops.spherical import legendre_Pbar

__all__ = [
    "potential_matrix_dia",
    "finite_nucleus_Vnuc",
    "guess_hamiltonian_dia",
    "density_line",
    "density_grid",
    "orbital_moments_dia",
    "nuclear_densities_dia",
    "occupied_orbital_vectors_dia",
]


def potential_matrix_dia(basis: DiatomicBasis, g: DiaGridOps, V) -> np.ndarray:
    """<chi_A | V | chi_B> for a phi-independent potential V(r1, r2, z, rho)
    given as a callable of the two focus distances (reference:
    TwoDGridWorker::model_potential, twodquadrature.cpp)."""
    mu = basis.mu  # [nelem, nq]
    neta = g.TT.shape[-1]
    from helfem_tpu.ops.quadrature import gauss_legendre

    etav, _ = gauss_legendre(neta)
    Rh = basis.Rhalf
    xi = np.cosh(mu)
    r1 = Rh * (xi[:, :, None] + etav[None, None, :])
    r2 = Rh * (xi[:, :, None] - etav[None, None, :])
    Vg = V(r1, r2)
    w = np.asarray(g.w)
    A1 = np.einsum("eqt,abt->abeq", w * Vg, np.asarray(g.TT), optimize=True)
    Vel = np.einsum("abeq,eqi,eqj->abeij", A1, basis.B, basis.B, optimize=True)
    nang, nrad = basis.nang, basis.nrad
    gi = basis.fem.gidx
    out = np.zeros((nang, nang, nrad + 1, nrad + 1))
    for e in range(basis.fem.nelem):
        out[:, :, gi[e][:, None], gi[e][None, :]] += Vel[:, :, e]
    out = out[:, :, :nrad, :nrad].transpose(0, 2, 1, 3).reshape(nang * nrad, nang * nrad)
    m2 = basis.shell_mask().reshape(-1)
    return out * m2[:, None] * m2[None, :]


def finite_nucleus_Vnuc(
    basis: DiatomicBasis,
    model: str,
    Rrms1: float,
    Rrms2: float,
    g: DiaGridOps | None = None,
) -> np.ndarray:
    """Nuclear attraction for finite-nucleus charge models evaluated on the
    2D (mu, eta) quadrature grid (reference: src/diatomic/main.cpp:492-514,
    qgrid.model_potential(pot1, pot2)). model in {'gaussian', 'spherical',
    'hollow', 'regularized'}; Rrms1/Rrms2 are the per-nucleus rms radii."""
    from helfem_tpu.models.atomic import nuclear_model_V

    if g is None:
        g = build_dia_grid(basis)
    V1 = nuclear_model_V(model, basis.Z1, Rrms1) if basis.Z1 > 0 else (lambda r: 0.0 * r)
    V2 = nuclear_model_V(model, basis.Z2, Rrms2) if basis.Z2 > 0 else (lambda r: 0.0 * r)
    return potential_matrix_dia(basis, g, lambda r1, r2: V1(r1) + V2(r2))


def guess_hamiltonian_dia(basis: DiatomicBasis, kind: str = "SAP") -> np.ndarray:
    """T + sum of the two atoms' screened-nucleus potentials on the 2D grid
    (reference: src/diatomic/main.cpp:654-701)."""
    from helfem_tpu.scf.guess import potential

    g = build_dia_grid(basis)
    V1 = potential(kind, basis.Z1) if basis.Z1 > 0 else (lambda r: 0.0 * r)
    V2 = potential(kind, basis.Z2) if basis.Z2 > 0 else (lambda r: 0.0 * r)
    Vmat = potential_matrix_dia(basis, g, lambda r1, r2: V1(r1) + V2(r2))
    return basis.kinetic() * np.outer(
        basis.shell_mask().reshape(-1), basis.shell_mask().reshape(-1)
    ) + Vmat


def _point_to_prolate(basis: DiatomicBasis, z, rho):
    """(mu, eta) for cylindrical coordinates (z, rho)."""
    Rh = basis.Rhalf
    r1 = np.sqrt(rho**2 + (z + Rh) ** 2)
    r2 = np.sqrt(rho**2 + (z - Rh) ** 2)
    xi = np.clip((r1 + r2) / (2 * Rh), 1.0, None)
    eta = np.clip((r1 - r2) / (2 * Rh), -1.0, 1.0)
    return np.arccosh(xi), eta


def eval_density_points(basis: DiatomicBasis, P: np.ndarray, z, rho):
    """Electron density at cylindrical points (z, rho) from the full density
    matrix P (m-block-diagonal)."""
    z = np.atleast_1d(np.asarray(z, dtype=float))
    rho = np.broadcast_to(np.atleast_1d(np.asarray(rho, dtype=float)), z.shape)
    mu, eta = _point_to_prolate(basis, z, rho)
    nang, nrad = basis.nang, basis.nrad
    # radial values at arbitrary mu: locate elements
    fem = basis.fem
    Bv = np.zeros((len(z), nrad + 1))
    eidx = np.clip(np.searchsorted(fem.bval, mu, side="right") - 1, 0, fem.nelem - 1)
    for k in range(len(z)):
        e = eidx[k]
        x = (mu[k] - fem.mids[e]) / (0.5 * fem.lengths[e])
        vals = fem.eval_element(e, np.array([x]), 0)[0][0]
        Bv[k][fem.gidx[e]] += vals
    Bv = Bv[:, :nrad]
    lmax = int(basis.lval.max())
    Pb = legendre_Pbar(lmax, eta)
    Th = np.zeros((nang, len(z)))
    for a in range(nang):
        Th[a] = Pb[basis.lval[a], abs(basis.mval[a])]
    mask = basis.shell_mask()
    P4 = P.reshape(nang, nrad, nang, nrad)
    same_m = basis.mval[:, None] == basis.mval[None, :]
    dens = np.zeros(len(z))
    for a in range(nang):
        for b in range(nang):
            if not same_m[a, b]:
                continue
            va = Bv * mask[a][None, :]
            vb = Bv * mask[b][None, :]
            dens += Th[a] * Th[b] * np.einsum("kI,IJ,kJ->k", va, P4[a, :, b, :], vb)
    return dens


def density_line(basis: DiatomicBasis, P: np.ndarray, npts: int = 200, zmax: float = None):
    """Density along the internuclear axis (reference: diatomic_dline,
    src/diatomic/density_line.cpp). Returns (z, n(z))."""
    if zmax is None:
        zmax = 3.0 * basis.Rhalf
    z = np.linspace(-zmax, zmax, npts)
    return z, eval_density_points(basis, P, z, np.zeros_like(z) + 1e-9)


def density_grid(basis: DiatomicBasis, P: np.ndarray, nz: int = 100, nrho: int = 50,
                 zmax: float = None, rhomax: float = None):
    """Density on a (z, rho) half-plane grid (reference: diatomic_dgrid).
    Returns (z, rho, n[nz, nrho])."""
    if zmax is None:
        zmax = 3.0 * basis.Rhalf
    if rhomax is None:
        rhomax = 2.0 * basis.Rhalf
    z = np.linspace(-zmax, zmax, nz)
    rho = np.linspace(1e-9, rhomax, nrho)
    Z, R = np.meshgrid(z, rho, indexing="ij")
    n = eval_density_points(basis, P, Z.ravel(), R.ravel()).reshape(nz, nrho)
    return z, rho, n


# ----------------------------------------------------------------------------
# Core-basis determination (reference: src/diatomic/corebasis.cpp)
# ----------------------------------------------------------------------------

# Z at which each new (n,l) shell opens in the Madelung filling order,
# mapped to l (standard periodic-table chemistry).
_SHELL_OPEN = [
    (1, 0), (3, 0), (5, 1), (11, 0), (13, 1), (19, 0), (21, 2), (31, 1),
    (37, 0), (39, 2), (49, 1), (55, 0), (57, 3), (71, 2), (81, 1), (87, 0),
    (89, 3), (103, 2), (113, 1),
]


def num_orbs(Z1: int, Z2: int) -> list[int]:
    """Number of occupied orbitals per m-type (sigma, pi, delta, phi) for the
    separated-atom limit (reference: num_orbs, src/general/elements.cpp:48-79):
    each open (n,l) shell of either atom contributes one orbital to every
    m-type <= l."""
    counts = [0, 0, 0, 0]
    for Z in (Z1, Z2):
        for z0, l in _SHELL_OPEN:
            if Z >= z0:
                for m in range(l + 1):
                    counts[m] += 1
    while counts and counts[-1] == 0:
        counts.pop()
    return counts


def core_channel_energies(basis: DiatomicBasis, norb_per_m: dict) -> dict:
    """Sum of the lowest norb one-electron (core Hamiltonian) eigenvalues per
    |m| channel, from a generalized symmetric eigensolve on the masked
    channel subspace."""
    import scipy.linalg

    H0 = basis.kinetic() + basis.nuclear()
    S = basis.overlap()
    mask = basis.shell_mask().reshape(-1) > 0
    mrow = np.repeat(basis.mval, basis.nrad)
    out = {}
    for m, norb in norb_per_m.items():
        idx = np.nonzero(mask & (mrow == m))[0]
        w = scipy.linalg.eigh(
            H0[np.ix_(idx, idx)], S[np.ix_(idx, idx)], eigvals_only=True
        )
        out[m] = float(np.sum(w[:norb]))
    return out


def core_basis_scan(
    Z1: int,
    Z2: int,
    Rbond: float,
    thresh: int = 8,
    nadd: int = 2,
    rmax: float = 40.0,
    nelem: int = 1,
    nnodes: int = 15,
    igrid: int = 4,
    zexp: float = 1.0,
    verbose: bool = False,
):
    """Determine the per-m lmax needed to converge the occupied core orbitals
    to a series of thresholds 1e-1 .. 1e-thresh (reference: corebasis.cpp
    main loop). Returns list of (threshold, lmax-per-m tuple)."""
    norbs = num_orbs(Z1, Z2)
    nm = len(norbs)
    lmax = [m for m in range(nm)]  # minimal start: one function per channel
    results = []

    def energies(lm):
        b = DiatomicBasis(
            Z1=Z1, Z2=Z2, Rbond=Rbond, lmax=tuple(lm), rmax=rmax,
            nelem=nelem, nnodes=nnodes, igrid=igrid, zexp=zexp,
        )
        return core_channel_energies(b, {m: norbs[m] for m in range(nm)})

    E = energies(lmax)
    for ithr in range(1, thresh + 1):
        thr = 10.0 ** (-ithr)
        for m in range(nm - 1, -1, -1):
            while lmax[m] < 60:
                trial = list(lmax)
                trial[m] += nadd
                # channels are nested: lmax must not increase with m-type
                for mm in range(m):
                    trial[mm] = max(trial[mm], trial[m])
                Et = energies(trial)
                dE = E[m] - Et[m]
                if verbose:
                    print(f"thr=1e-{ithr} m={m}: lmax {lmax[m]} -> {trial[m]}, dE = {dE:.3e}")
                if abs(dE) < thr:
                    break
                lmax = trial
                E = Et
        results.append((thr, tuple(lmax)))
    return results


def orbital_moments_dia(basis: DiatomicBasis, c: np.ndarray) -> dict:
    """Radial moments of one orbital |phi|^2 about the left/right nucleus
    and the geometrical center (reference: TwoDBasis::radial_moments +
    the per-orbital analysis tables, src/diatomic/main.cpp:1033-1086).

    c: full-basis coefficient vector [nbf] (one m channel). Returns
    {'left': {n: <r_l^n>}, 'right': ..., 'center': {2: <r_c^2>}} with
    n in (-1, 1, 2, 3); in prolate coordinates r_{l,r} = Rh (cosh mu +- eta)
    so the moments are plain quadrature sums."""
    from helfem_tpu.ops.quadrature import gauss_legendre

    nang, nrad = basis.nang, basis.nrad
    lmax = int(basis.lval.max())
    neta = 2 * lmax + 16
    eta, weta = gauss_legendre(neta)
    Pb = legendre_Pbar(lmax, eta)
    Th = np.zeros((nang, neta))
    for a in range(nang):
        Th[a] = Pb[basis.lval[a], abs(basis.mval[a])]
    mask = basis.shell_mask()
    c4 = (c.reshape(nang, nrad) * mask)
    # radial part per shell on the quadrature grid: [nang, nelem, nq]
    gi = basis.fem.gidx
    cpad = np.zeros((nang, nrad + 1))
    cpad[:, :nrad] = c4
    phi_mu = np.einsum("eqi,aei->aeq", basis.B, cpad[:, gi])
    # orbital on the (mu, eta) grid (all shells share one m in a symmetry
    # orbital, so the pointwise square is the physical density)
    F = np.einsum("aeq,at->eqt", phi_mu, Th)
    ch = np.cosh(basis.mu)
    w3 = (ch[:, :, None] ** 2 - eta[None, None, :] ** 2) * (
        np.sinh(basis.mu) * basis.wmu
    )[:, :, None] * weta[None, None, :]
    dens = F * F * w3
    norm = dens.sum()
    Rh = basis.Rhalf
    r_l = Rh * (ch[:, :, None] + eta[None, None, :])
    r_r = Rh * (ch[:, :, None] - eta[None, None, :])
    rc2 = Rh**2 * (ch[:, :, None] ** 2 + eta[None, None, :] ** 2 - 1.0)
    out = {"left": {}, "right": {}, "center": {}}
    for n in (-1, 1, 2, 3):
        out["left"][n] = float((dens * r_l**n).sum() / norm)
        out["right"][n] = float((dens * r_r**n).sum() / norm)
    out["center"][2] = float((dens * rc2).sum() / norm)
    return out


def nuclear_densities_dia(basis: DiatomicBasis, P: np.ndarray):
    """Electron density at the two nuclei (reference:
    TwoDBasis::nuclear_density, src/diatomic/main.cpp:1024-1031)."""
    eps = 1e-7
    z = np.array([-basis.Rhalf * (1.0 - eps), basis.Rhalf * (1.0 - eps)])
    n = eval_density_points(basis, P, z, np.full(2, basis.Rhalf * eps))
    return float(n[0]), float(n[1])


def occupied_orbital_vectors_dia(basis: DiatomicBasis, orbs, occ, E_blocks):
    """Expand block orbitals into full-basis vectors for the occupied
    columns, sorted by eigenvalue. Returns [(E, occ, c[nbf]), ...]."""
    blocks = None
    for parity in (True, False):
        b = basis.sym_blocks(parity)
        if len(b) == np.asarray(orbs).shape[0]:
            blocks = b
            break
    if blocks is None:
        raise ValueError("orbital block count matches no symmetry setup")
    out = []
    for b, idx in enumerate(blocks):
        ni = len(idx)
        for k in range(np.asarray(occ).shape[1]):
            if occ[b][k] <= 0:
                continue
            c = np.zeros(basis.nbf)
            c[idx] = np.asarray(orbs)[b][:ni, k]
            out.append((float(E_blocks[b][k]), float(occ[b][k]), c))
    out.sort(key=lambda t: t[0])
    return out
