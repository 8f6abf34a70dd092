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
    "guess_hamiltonian_dia",
    "density_line",
    "density_grid",
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
