"""Debug J/K against dense reference contractions (tiny basis)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from helfem_tpu.models.atomic import AtomicBasis, coulomb, exchange

np.set_printoptions(precision=6, suppress=True)

b = AtomicBasis(Z=2, lmax=1, mmax=0, rmax=15.0, nelem=3, nnodes=5, nquad=40)
ops = b.build_operators()
nang, nrad, NL = b.nang, b.nrad, b.NL
nelem, nprim = b.rb.fem.nelem, b.rb.fem.nprim
gidx = b.rb.fem.gidx

# dense radial TEI tensor R_L[I,J,K,L]
tei = np.asarray(ops.tei)
U = np.asarray(ops.disjL)
V = np.asarray(ops.disjm1L)
R = np.zeros((NL, nrad + 1, nrad + 1, nrad + 1, nrad + 1))
for L in range(NL):
    for e in range(nelem):
        ie = gidx[e]
        # in-element
        R[L][np.ix_(ie, ie, ie, ie)] += tei[L, e]
        for f in range(nelem):
            if f == e:
                continue
            jf = gidx[f]
            if e < f:
                blk = np.einsum("ij,kl->ijkl", U[L, e], V[L, f])
            else:
                blk = np.einsum("ij,kl->ijkl", V[L, e], U[L, f])
            R[L][np.ix_(ie, ie, jf, jf)] += blk
R = R[:, :nrad, :nrad, :nrad, :nrad]

G = np.asarray(ops.G)  # [NL, NM, nang, nang]
Lfac = 4 * np.pi / (2 * np.arange(NL) + 1)

# dense full TEI (AB|CD), A=(a,I)...
dense = np.einsum("L,LMab,LMcd,LIJKP->aIbJcKdP", Lfac, G, G, R, optimize=True)
nbf = nang * nrad
dense = dense.reshape(nbf, nbf, nbf, nbf)

rng = np.random.default_rng(1)
X = rng.standard_normal((nbf, nbf))
P = X + X.T

Jd = np.einsum("ABCD,CD->AB", dense, P)
Kd = -np.einsum("ABCD,AD->BC", dense, P)

Jg = np.asarray(coulomb(ops, jnp.asarray(P)))
Kg = np.asarray(exchange(ops, jnp.asarray(P)))

print("J dense vs coulomb():", np.abs(Jd - Jg).max(), "scale", np.abs(Jd).max())
print("K dense vs exchange():", np.abs(Kd - Kg).max(), "scale", np.abs(Kd).max())
print("J symm err:", np.abs(Jg - Jg.T).max())
print("K symm err:", np.abs(Kg - Kg.T).max())

# physical check on radial TEI: hydrogenic 1s self-repulsion (aa|aa) = 5Z/8
from helfem_tpu.utils.linalg import eig_gsym_lm

b0 = AtomicBasis(Z=2, lmax=0, mmax=0, rmax=30.0, nelem=8, nnodes=10)
ops0 = b0.build_operators()
E, C = eig_gsym_lm(jnp.asarray(b0.kinetic() + b0.nuclear()), ops0.Sinvh_rad)
c = np.asarray(C)[0][:, 0]
P0 = jnp.asarray(np.outer(c, c))
J0 = coulomb(ops0, P0)
val = float(jnp.vdot(P0, J0))
print("(1s1s|1s1s) =", val, " exact 5Z/8 =", 5 * 2 / 8)
K0 = exchange(ops0, P0)
print("self-exchange -(aa|aa):", float(jnp.vdot(P0, K0)))
