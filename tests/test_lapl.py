"""Laplacian-level meta-GGA machinery (family 'mggal') + BR89 exchange."""

import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, _pad_rad, _to4
from helfem_tpu.models.atomic_dft import _density_fields, build_dft_grid, eval_fxc
from helfem_tpu.ops.xc import parse_method
from helfem_tpu.scf.atomic_scf import scf_atom


def _random_density(basis, seed=0):
    rng = np.random.default_rng(seed)
    n = basis.nbf
    X = rng.standard_normal((n, 4)) * 0.3
    P = X @ X.T
    return P


def test_lapl_field_identities():
    """For a smooth (converged SCF) density: int lapl(rho) dV = 0 and
    int r^2 lapl(rho) dV = 6 N (integration by parts). A random FEM density
    would NOT satisfy these -- FEM densities are only C0 across element
    boundaries, and the missing derivative-jump surface terms are exactly
    what SCF convergence drives to zero."""
    b = AtomicBasis(Z=2, lmax=1, mmax=1, rmax=25.0, nelem=10, nnodes=14)
    res = scf_atom(b, 1, 1, convthr=1e-10)
    from helfem_tpu.utils.linalg import build_blocks, density_blocks

    ops = b.build_operators()
    bi, _ = build_blocks(np.asarray(ops.S), b.sym_blocks(2))
    Pa = density_blocks(
        jnp.asarray(res.orbs_a), jnp.asarray(res.occ_a), jnp.asarray(bi), ops.S
    )
    g = build_dft_grid(b)
    P4 = _pad_rad(_to4(Pa, b.nang, b.rb.fem.nbf))
    rho, _, _, _, lap = _density_fields(g, P4, False, True)
    w = np.asarray(g.w2[:, :, None] * g.wth[None, None, :])
    lap = np.asarray(lap)
    rho = np.asarray(rho)
    r = np.asarray(g.r)[:, :, None]
    N = np.sum(w * rho)
    assert abs(N - 1.0) < 1e-10
    assert abs(np.sum(w * lap)) < 1e-7
    assert abs(np.sum(w * r**2 * lap) - 6.0 * N) < 1e-7


def test_br89_fock_is_energy_derivative():
    """The vlapl Fock plumbing: Tr(Delta F) == directional derivative of Exc
    for the full BR89 energy (validates every lapl Fock term at once)."""
    b = AtomicBasis(Z=2, lmax=1, mmax=1, rmax=20.0, nelem=6, nnodes=8)
    g = build_dft_grid(b)
    funcs, _ = parse_method("mgga_x_br89")
    nrad = b.rb.fem.nbf
    P = _random_density(b, 1) + 0.1 * np.eye(b.nbf)
    rng = np.random.default_rng(2)
    D = rng.standard_normal((b.nbf, b.nbf)) * 0.01
    D = D + D.T

    def E(Pm):
        return float(eval_fxc(funcs, g, jnp.asarray(Pm), jnp.asarray(Pm), nrad)[2])

    Fa, Fb, Exc, Nel = eval_fxc(funcs, g, jnp.asarray(P), jnp.asarray(P), nrad)
    eps = 1e-5
    dE_num = (E(P + eps * D) - E(P - eps * D)) / (2 * eps)
    dE_an = float(jnp.vdot(jnp.asarray(D), Fa + Fb))
    assert abs(dE_num - dE_an) < 1e-6 * max(abs(dE_num), 1.0), (dE_num, dE_an)


def test_br89_hydrogen_exact_on_grid():
    """BR89 is exact for one-electron densities: Exc on the converged H
    density = -5/16 through the full grid pipeline."""
    b = AtomicBasis(Z=1, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=12)
    res = scf_atom(b, 1, 0, convthr=1e-10)
    from helfem_tpu.utils.linalg import density_blocks

    # rebuild Pa from blocks
    import jax.numpy as jnp2

    ops = b.build_operators()
    from helfem_tpu.scf.atomic_scf import _full_sinvh  # noqa: F401

    nrad = b.rb.fem.nbf
    C = jnp2.asarray(res.orbs_a)
    blkidx = jnp2.asarray(np.arange(nrad)[None, :])
    Pa = density_blocks(C, jnp2.asarray(res.occ_a), blkidx, ops.S)
    g = build_dft_grid(b)
    funcs, _ = parse_method("mgga_x_br89")
    _, _, Exc, Nel = eval_fxc(funcs, g, Pa, jnp2.zeros_like(Pa), nrad)
    assert abs(float(Nel) - 1.0) < 1e-9
    assert abs(float(Exc) + 0.3125) < 1e-7, float(Exc)


def test_br89_scf_smoke():
    """Exchange-only BR89 SCF on He converges to a sane energy."""
    b = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=25.0, nelem=8, nnodes=10)
    res = scf_atom(b, 1, 1, method="mgga_x_br89", convthr=1e-6, maxit=160)
    assert res.converged
    # HF-quality exchange, no correlation: near the HF energy
    assert -2.95 < res.E < -2.80, res.E
