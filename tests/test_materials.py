"""Diagonal-space derivative unit tests for both materials.

These mirror the reference's built-in test suite (Diagnostic mode `1 11`,
reference: src/Utils/Diagnostic.hpp:60-73 -> Energy.cpp:1279-1520):
finite-difference checks of dPsi/dsigma, d2Psi/dsigma2, BLeftCoef, and
dPsi/dF on identity / near-identity / random inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dot_tpu.materials import MATERIALS, cofactor3
from dot_tpu.kernels.svd3 import svd3x3_flip

MATS = list(MATERIALS.values())


def _params(rng, n):
    ym = 1.0e5
    pr = 0.4
    u = np.full(n, ym / (2.0 * (1.0 + pr)))
    lam = np.full(n, ym * pr / ((1.0 + pr) * (1.0 - 2.0 * pr)))
    return jnp.asarray(u), jnp.asarray(lam)


def _sigmas(rng, n):
    s = np.concatenate([
        np.ones((2, 3)),                      # rest
        rng.uniform(0.2, 2.5, size=(n, 3)),   # random stretches
        np.array([[1.5, 1.0, -0.3]]),         # inverted (flip-SVD sign)
        np.array([[2.0, 1.0, 1e-4]]),         # near-degenerate
    ])
    return jnp.asarray(s)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_dpsi_dsigma_fd(mat, rng):
    sigma = _sigmas(rng, 16)
    u, lam = _params(rng, sigma.shape[0])
    g = mat.dpsi_dsigma(sigma, u, lam)
    g_ad = jax.vmap(jax.grad(lambda s, uu, ll: mat.psi(s, uu, ll)))(sigma, u, lam)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_d2psi_dsigma2_fd(mat, rng):
    sigma = _sigmas(rng, 16)
    u, lam = _params(rng, sigma.shape[0])
    h = mat.d2psi_dsigma2(sigma, u, lam)
    h_ad = jax.vmap(jax.hessian(lambda s, uu, ll: mat.psi(s, uu, ll)))(sigma, u, lam)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), rtol=1e-8, atol=1e-6)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_b_left_coef_divided_difference(mat, rng):
    """BLeftCoef[k] == (dPsi/ds_i - dPsi/ds_j) / (2 (s_i - s_j)) for the
    pair ordering (0,1), (1,2), (2,0) (reference: unitTest_BLeftCoef,
    Energy.cpp:1380-1416)."""
    sigma = jnp.asarray(rng.uniform(0.3, 2.0, size=(32, 3)))
    u, lam = _params(rng, sigma.shape[0])
    b = mat.b_left_coef(sigma, u, lam)
    g = mat.dpsi_dsigma(sigma, u, lam)
    for k, (i, j) in enumerate(((0, 1), (1, 2), (2, 0))):
        dd = (g[:, i] - g[:, j]) / (2.0 * (sigma[:, i] - sigma[:, j]))
        np.testing.assert_allclose(np.asarray(b[:, k]), np.asarray(dd),
                                   rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_first_piola_vs_fd(mat, rng):
    """P = dPsi/dF checked by central differences of Psi(F) through the SVD."""
    n = 8
    F = jnp.asarray(rng.normal(size=(n, 3, 3)) * 0.4 + np.eye(3))
    u, lam = _params(rng, n)

    U, sigma, V = svd3x3_flip(F)
    P = np.asarray(mat.first_piola(F, U, sigma, V, u, lam))

    @jax.jit
    def psi_of_F(Fm):
        _, s, _ = svd3x3_flip(Fm)
        return mat.psi(s, u, lam)

    h = 1e-6
    P_fd = np.zeros_like(P)
    for i in range(3):
        for j in range(3):
            dF = jnp.zeros_like(F).at[:, i, j].set(h)
            P_fd[:, i, j] = (np.asarray(psi_of_F(F + dF)) -
                             np.asarray(psi_of_F(F - dF))) / (2 * h)
    scale = np.maximum(np.abs(P).max(), 1.0)
    np.testing.assert_allclose(P / scale, P_fd / scale, atol=5e-5)


def test_cofactor_is_det_gradient(rng):
    F = jnp.asarray(rng.normal(size=(5, 3, 3)))
    C = cofactor3(F)
    C_ad = jax.vmap(jax.grad(jnp.linalg.det))(F)
    np.testing.assert_allclose(np.asarray(C), np.asarray(C_ad), rtol=1e-9, atol=1e-9)
