"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helfem_tpu.models.atomic import AtomicBasis, coulomb, exchange
from helfem_tpu.parallel.mesh import make_mesh, sharded_scf_step
from helfem_tpu.utils.linalg import eig_gsym_lm


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_step_matches_single(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    b = AtomicBasis(Z=4, lmax=2, mmax=1, rmax=15.0, nelem=4, nnodes=6, nquad=40)
    ops = b.build_operators()
    mesh = make_mesh(ndev)
    step, ops_pad = sharded_scf_step(mesh, ops, kfrac=1.0)

    rng = np.random.default_rng(0)
    # a physical-ish density: block-diagonal symmetric PSD
    nang, nrad = b.nang, b.nrad
    Pa = np.zeros((b.nbf, b.nbf))
    for a in range(nang):
        X = rng.standard_normal((nrad, 2)) * 0.1
        Pa[a * nrad : (a + 1) * nrad, a * nrad : (a + 1) * nrad] = X @ X.T
    Pa = jnp.asarray(Pa)

    Fa, Fb, Ea, Ca, Eb, Cb, E = step(Pa, Pa)

    # unsharded reference
    P = Pa + Pa
    J = coulomb(ops, P)
    K = exchange(ops, Pa)
    Fref = ops.H0 + J + K
    assert np.abs(np.asarray(Fa) - np.asarray(Fref)).max() < 1e-10
    Eref, Cref = eig_gsym_lm(Fref, ops.Sinvh_rad)
    assert np.abs(np.asarray(Ea) - np.asarray(Eref)).max() < 1e-8

    # block-diagonal-density collapsed exchange shard (the SCF hot path)
    step_bd, _ = sharded_scf_step(mesh, ops, kfrac=1.0, bd=True)
    Fa_bd, *_ = step_bd(Pa, Pa)
    assert np.abs(np.asarray(Fa_bd) - np.asarray(Fref)).max() < 1e-10


def test_sharded_dia_fock_matches(ndev=4):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.diatomic import DiatomicBasis, coulomb_dia, exchange_dia
    from helfem_tpu.parallel.mesh import sharded_dia_fock

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(3,), rmax=15.0, nelem=3, nnodes=6)
    ops = b.build_operators()
    mesh = make_mesh(ndev)
    fock, ops_pad = sharded_dia_fock(mesh, ops, kfrac=1.0)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((b.nbf, b.nbf)) * 0.05
    Pa = jnp.asarray(X @ X.T)
    Fa, Fb, Ecoul, Exx = fock(Pa, Pa)
    J = coulomb_dia(ops, Pa + Pa)
    K = exchange_dia(ops, Pa)
    Fref = ops.H0 + J + K
    assert np.abs(np.asarray(Fa) - np.asarray(Fref)).max() < 1e-10


def test_sharded_dia_exchange_occ_matches(ndev=4):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.diatomic import DiatomicBasis, exchange_dia_occ
    from helfem_tpu.parallel.mesh import sharded_dia_exchange_occ

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(3,), rmax=15.0, nelem=3, nnodes=6)
    ops = b.build_operators()
    mesh = make_mesh(ndev)
    rng = np.random.default_rng(1)
    no = 4
    m2 = np.asarray(ops.shellmask).reshape(-1)
    Co = jnp.asarray(rng.standard_normal((b.nbf, no)) * 0.2) * m2[:, None]
    kfn = sharded_dia_exchange_occ(mesh, ops, no)
    K = np.asarray(kfn(Co))
    Kref = np.asarray(exchange_dia_occ(ops, Co))
    assert np.abs(K - Kref).max() < 1e-11 * max(np.abs(Kref).max(), 1.0)


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_xc_fock_matches(ndev):
    """Element-sharded XC quadrature (the DFTGrid OpenMP-loop replacement)
    reproduces the single-device Fxc/Exc/Nel bit-for-bit-close."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.atomic_dft import build_dft_grid, eval_fxc
    from helfem_tpu.ops.xc import parse_method
    from helfem_tpu.parallel.mesh import sharded_xc_fock

    b = AtomicBasis(Z=4, lmax=1, mmax=1, rmax=15.0, nelem=5, nnodes=6, nquad=40)
    b.build_operators()
    g = build_dft_grid(b)
    funcs, _ = parse_method("PBE")
    mesh = make_mesh(ndev)
    xc, _ = sharded_xc_fock(mesh, g, tuple(funcs), b.nrad)

    rng = np.random.default_rng(1)
    nang, nrad = b.nang, b.nrad
    Pa = np.zeros((b.nbf, b.nbf))
    for a in range(nang):
        X = rng.standard_normal((nrad, 2)) * 0.1
        Pa[a * nrad : (a + 1) * nrad, a * nrad : (a + 1) * nrad] = X @ X.T
    Pa = jnp.asarray(Pa)

    Fa, Fb, Exc, Nel = xc(Pa, Pa)
    Fr_a, Fr_b, Exc_r, Nel_r = eval_fxc(tuple(funcs), g, Pa, Pa, b.nrad)
    assert np.abs(np.asarray(Fa) - np.asarray(Fr_a)).max() < 1e-11
    assert abs(float(Exc) - float(Exc_r)) < 1e-11
    assert abs(float(Nel) - float(Nel_r)) < 1e-11


def test_sharded_dia_eig_matches(ndev=4):
    """Block-sharded diatomic eigensolve == single-device eig_blocks_dia."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.parallel.mesh import sharded_dia_eig
    from helfem_tpu.scf.diatomic_scf import eig_blocks_dia

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(2,), rmax=10.0, nelem=2,
                      nnodes=5, nquad=25)
    ops = b.build_operators()
    eig = sharded_dia_eig(make_mesh(ndev), ops)
    Es, Cs = eig(ops.H0)
    E1, C1 = eig_blocks_dia(ops, ops.H0)
    assert np.allclose(np.asarray(Es), np.asarray(E1), atol=1e-10)


def test_sharded_dia_xc_matches(ndev=4):
    """mu-element-sharded diatomic XC == single-device eval_fxc_dia."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.models.diatomic_dft import build_dia_grid, eval_fxc_dia
    from helfem_tpu.ops.xc import parse_method
    from helfem_tpu.parallel.mesh import sharded_dia_xc

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(2,), rmax=10.0, nelem=2,
                      nnodes=5, nquad=25)
    ops = b.build_operators()
    g = build_dia_grid(b)
    funcs = tuple(parse_method("PBE")[0])
    xc, _ = sharded_dia_xc(make_mesh(ndev), g, funcs, ops)
    Pd = jnp.asarray(0.01 * np.eye(b.nbf))
    Fa, Fb, Exc, Nel = xc(Pd, Pd)
    Fr_a, Fr_b, Exc_r, Nel_r = eval_fxc_dia(funcs, g, ops, Pd, Pd)
    assert np.abs(np.asarray(Fa) - np.asarray(Fr_a)).max() < 1e-11
    assert abs(float(Exc) - float(Exc_r)) < 1e-11


def test_scf_atom_ndev_converges(ndev=4):
    """END-TO-END --ndev path: full atomic SCF to convergence through the
    sharded Fock build + sharded blocked eigensolve equals the
    single-device driver's converged energy (the user-facing multi-chip
    replacement for the reference's always-on OpenMP,
    src/atomic/TwoDBasis.cpp:987-1005)."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = AtomicBasis(Z=4, lmax=1, mmax=1, rmax=15.0, nelem=4, nnodes=6, nquad=40)
    ops = b.build_operators()
    r1 = scf_atom(b, 2, 2, convthr=1e-9, maxit=40, ops=ops)
    rN = scf_atom(b, 2, 2, convthr=1e-9, maxit=40, ops=ops, ndev=ndev)
    assert rN.converged
    assert abs(rN.E - r1.E) < 1e-9


def test_scf_atom_ndev_dft_converges(ndev=4):
    """--ndev with a GGA: the element-sharded XC quadrature runs inside the
    sharded Fock build to convergence."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.scf.atomic_scf import scf_atom

    b = AtomicBasis(Z=4, lmax=0, mmax=0, rmax=15.0, nelem=4, nnodes=6, nquad=40)
    ops = b.build_operators()
    r1 = scf_atom(b, 2, 2, method="PBE", convthr=1e-8, maxit=40, ops=ops)
    rN = scf_atom(b, 2, 2, method="PBE", convthr=1e-8, maxit=40, ops=ops,
                  ndev=ndev)
    assert rN.converged
    assert abs(rN.E - r1.E) < 1e-9


def test_scf_diatomic_ndev_converges(ndev=4):
    """END-TO-END --ndev diatomic SCF (H2 HF): sharded Coulomb channel scan +
    sharded occ-factorized exchange + sharded blocked eigensolve, run to
    convergence, equals the single-device result."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.diatomic import DiatomicBasis
    from helfem_tpu.scf.diatomic_scf import scf_diatomic

    b = DiatomicBasis(Z1=1, Z2=1, Rbond=1.4, lmax=(3,), rmax=15.0, nelem=3,
                      nnodes=6)
    ops = b.build_operators()
    r1 = scf_diatomic(b, 1, 1, convthr=1e-9, maxit=40, ops=ops)
    rN = scf_diatomic(b, 1, 1, convthr=1e-9, maxit=40, ops=ops, ndev=ndev)
    assert rN.converged
    assert abs(rN.E - r1.E) < 1e-9


def test_sharded_sad_exchange_matches(ndev=4):
    """L-sharded sadatom exchange == single-device sad_exchange."""
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    from helfem_tpu.models.sadatom import SadAtomBasis, sad_exchange
    from helfem_tpu.parallel.mesh import sharded_sad_exchange

    b = SadAtomBasis(Z=6, lmax=1, rmax=12.0, nelem=3, nnodes=5)
    ops = b.build_ops()
    kfn = sharded_sad_exchange(make_mesh(ndev), ops)
    rng = np.random.default_rng(2)
    Pang = jnp.asarray(0.1 * rng.standard_normal((b.lmax + 1, b.nrad, b.nrad)))
    Pang = (Pang + jnp.swapaxes(Pang, 1, 2)) / 2
    Ks = kfn(Pang)
    K1 = sad_exchange(ops, Pang)
    assert np.allclose(np.asarray(Ks), np.asarray(K1), atol=1e-12)
