"""Warm-started eigensolve (utils/linalg.py:eigh_warm): the fused SCF
chunks seed each iteration's blocked eigensolve with the previous
iteration's eigenvectors and run matmul-only refinement, falling back to
the full eigh when the residual certificate fails."""

import jax
import jax.numpy as jnp
import numpy as np

from helfem_tpu.utils.linalg import eigh_refined, eigh_warm


def _sym(rng, n, scale=1.0):
    A = rng.standard_normal((n, n)) * scale
    return jnp.asarray(0.5 * (A + A.T))


def test_warm_accepts_near_seed_and_matches_eigh():
    rng = np.random.default_rng(0)
    A = _sym(rng, 40, 10.0)
    E_ref, V_ref = eigh_refined(A)
    # perturb A slightly; seed with the unperturbed eigenvectors
    dA = _sym(rng, 40, 1e-6)
    E, V, good = eigh_warm(A + dA, V_ref, gate=1e-10)
    assert bool(good), "certificate should accept a near-converged seed"
    E2, V2 = eigh_refined(A + dA)
    assert np.allclose(np.asarray(E), np.asarray(E2), atol=1e-10)
    # eigenvector agreement up to sign (spectrum is generic here)
    ov = np.abs(np.asarray(V.T @ V2))
    assert np.allclose(np.diag(ov), 1.0, atol=1e-8)


def test_warm_falls_back_on_bad_seed():
    rng = np.random.default_rng(1)
    A = _sym(rng, 40, 10.0)
    V0 = jnp.eye(40)  # nowhere near the eigenbasis
    E, V, good = eigh_warm(A, V0, gate=1e-10)
    assert not bool(good), "identity seed must fail the certificate"
    E2, V2 = eigh_refined(A)
    assert np.allclose(np.asarray(E), np.asarray(E2), atol=1e-10)


def test_warm_batched():
    rng = np.random.default_rng(2)
    A = jnp.stack([_sym(rng, 24, 5.0) for _ in range(3)])
    E_ref, V_ref = eigh_refined(A)
    dA = jnp.stack([_sym(rng, 24, 1e-7) for _ in range(3)])
    E, V, good = eigh_warm(A + dA, V_ref, gate=1e-10)
    assert bool(good)
    E2, _ = eigh_refined(A + dA)
    assert np.allclose(np.asarray(E), np.asarray(E2), atol=1e-10)


def test_warm_residual_certificate_is_honest():
    """The accepted warm result's true residual must beat the gate."""
    rng = np.random.default_rng(3)
    A = _sym(rng, 30, 100.0)
    _, V_ref = eigh_refined(A)
    dA = _sym(rng, 30, 1e-5)
    E, V, good = eigh_warm(A + dA, V_ref, gate=1e-10)
    if bool(good):
        M = np.asarray(V.T @ (A + dA) @ V)
        off = np.abs(M - np.diag(np.diag(M))).max()
        assert off < 1e-10
    # orthonormality either way
    I = np.asarray(V.T @ V)
    assert np.allclose(I, np.eye(30), atol=1e-12)
