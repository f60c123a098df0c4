"""Tests for the batched flip-SVD and symmetric 3x3 eigendecomposition."""

import numpy as np
import jax
import jax.numpy as jnp

from dot_tpu.kernels import svd3

# jit once — the kernels are built to live inside larger jits; calling them
# op-by-op is pathologically slow on a 1-core CPU host
eigh3x3 = jax.jit(svd3.eigh3x3)
svd3x3_flip = jax.jit(svd3.svd3x3_flip)
make_pd3 = jax.jit(svd3.make_pd3)


def _random_F(rng, n):
    F = rng.normal(size=(n, 3, 3))
    # include tricky cases
    extra = np.array([
        np.eye(3),                                # identity
        np.diag([1.0, 1.0, -1.0]),                # reflection (det < 0)
        np.diag([2.0, 1e-8, 1e-8]),               # near rank-1
        np.diag([1.0, 1.0, 0.0]),                 # rank-2
        np.zeros((3, 3)),                         # zero
        np.diag([3.0, 3.0, 3.0]),                 # repeated sigma
        np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]),  # pure rotation
    ])
    return jnp.asarray(np.concatenate([F, extra]))


def test_eigh3x3_reconstruction(rng):
    A = rng.normal(size=(64, 3, 3))
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    w, Q = eigh3x3(A)
    R = (Q * w[..., None, :]) @ jnp.swapaxes(Q, -1, -2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(A), atol=1e-10)
    # orthonormal
    QtQ = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q)
    np.testing.assert_allclose(QtQ, np.broadcast_to(np.eye(3), QtQ.shape), atol=1e-12)


def test_svd_reconstruction_and_convention(rng):
    F = _random_F(rng, 200)
    U, s, V = svd3x3_flip(F)
    U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
    Fn = np.asarray(F)

    # reconstruction
    R = np.einsum("nij,nj,nkj->nik", U, s, V)
    np.testing.assert_allclose(R, Fn, atol=1e-8)

    # proper rotations
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-9)

    # ordering: s0 >= s1 >= |s2|, s0 >= 0, s1 >= 0
    assert np.all(s[:, 0] >= s[:, 1] - 1e-9)
    assert np.all(s[:, 1] >= np.abs(s[:, 2]) - 1e-9)
    assert np.all(s[:, 0] >= -1e-12)
    assert np.all(s[:, 1] >= -1e-12)

    # sign convention: prod(s) == det(F)
    np.testing.assert_allclose(np.prod(s, axis=-1), np.linalg.det(Fn),
                               atol=1e-8, rtol=1e-6)

    # magnitudes match numpy's singular values
    s_np = np.linalg.svd(Fn, compute_uv=False)
    np.testing.assert_allclose(np.abs(s), s_np, atol=1e-8)


def test_svd_extreme_scales(rng):
    F = jnp.asarray(rng.normal(size=(16, 3, 3)))
    for scale in (1e-12, 1e-6, 1e6, 1e10):
        Fs = F * scale
        U, s, V = svd3x3_flip(Fs)
        R = np.einsum("nij,nj,nkj->nik", np.asarray(U), np.asarray(s), np.asarray(V))
        np.testing.assert_allclose(R, np.asarray(Fs), rtol=1e-7, atol=1e-9 * scale)


def test_make_pd3(rng):
    A = rng.normal(size=(64, 3, 3))
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    P = np.asarray(make_pd3(A))
    w = np.linalg.eigvalsh(P)
    assert np.all(w >= -1e-9)
    # already-PSD matrices are unchanged
    S = np.asarray(A) @ np.swapaxes(np.asarray(A), -1, -2)
    P2 = np.asarray(make_pd3(jnp.asarray(S)))
    np.testing.assert_allclose(P2, S, rtol=1e-7, atol=1e-8)
