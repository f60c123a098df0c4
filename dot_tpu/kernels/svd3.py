"""Batched, branch-free 3x3 symmetric eigendecomposition and flip-SVD.

This replaces the reference's three SVD paths (JIXIE implicit-QR SVD,
analytic fastSVD3d, and the AVX2 Eftychios batch kernel — reference:
src/Utils/AutoFlipSVD.hpp, src/Utils/SVD_EFTYCHIOS/) with one vectorized
formulation that is the natural TPU shape: every op broadcasts over the
element batch and lowers to fused VPU code; there is no AoS->SoA gather
dance (reference: IglUtils.cpp:929-1086).

Flip-SVD convention (reference: AutoFlipSVD.hpp:41-82): U and V are proper
rotations (det = +1), singular values sorted descending by magnitude, and
only the LAST singular value carries the sign of det(F) (negative under
element inversion).

Algorithm: cyclic Jacobi on A = F^T F for V and eigenvalues, then a
modified Gram-Schmidt on B = F V for U, with the residual third column
built as u0 x u1 so that det(U) = +1 and sigma_2 = u2 . b2 is signed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Jacobi sweeps: 3 pair-rotations per sweep. 5 sweeps converge to ~1e-7
# relative (enough for f32); 9 reach f64 roundoff on random matrices.
_SWEEPS_F32 = 6
_SWEEPS_F64 = 10

_PAIRS = ((0, 1), (0, 2), (1, 2))


def _jacobi_rot(app, aqq, apq, eps):
    """Branch-free Jacobi rotation (c, s) zeroing the (p, q) entry."""
    small = jnp.abs(apq) <= eps * jnp.sqrt(jnp.abs(app * aqq) + eps)
    tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    # sign(0) = 0 would zero the rotation; treat tau==0 as +1
    t = jnp.where(tau == 0.0, 1.0, t)
    c = jax.lax.rsqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s


def eigh3x3(A, sweeps: int | None = None):
    """Eigendecomposition of symmetric (..., 3, 3) A.

    Returns (w, Q): eigenvalues (unsorted) and rotation matrices with
    A ~= Q diag(w) Q^T. Q has det +1 (product of rotations).
    """
    dtype = A.dtype
    if sweeps is None:
        sweeps = _SWEEPS_F64 if dtype == jnp.float64 else _SWEEPS_F32
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    Q = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape).copy()
    for _ in range(sweeps):
        for (p, q) in _PAIRS:
            c, s = _jacobi_rot(A[..., p, p], A[..., q, q], A[..., p, q], eps)
            # Build the Givens matrix J with J[p,p]=c, J[q,q]=c, J[p,q]=s, J[q,p]=-s
            J = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape).copy()
            J = J.at[..., p, p].set(c)
            J = J.at[..., q, q].set(c)
            J = J.at[..., p, q].set(s)
            J = J.at[..., q, p].set(-s)
            A = jnp.swapaxes(J, -1, -2) @ A @ J
            Q = Q @ J
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    return w, Q


def _sort3_desc(w, Q):
    """Sort eigenvalues descending; permute columns of Q accordingly."""

    def cswap(w, Q, i, j):
        do = w[..., i] < w[..., j]
        wi = jnp.where(do, w[..., j], w[..., i])
        wj = jnp.where(do, w[..., i], w[..., j])
        w = w.at[..., i].set(wi).at[..., j].set(wj)
        qi = jnp.where(do[..., None], Q[..., :, j], Q[..., :, i])
        qj = jnp.where(do[..., None], Q[..., :, i], Q[..., :, j])
        Q = Q.at[..., :, i].set(qi).at[..., :, j].set(qj)
        return w, Q

    w, Q = cswap(w, Q, 0, 1)
    w, Q = cswap(w, Q, 0, 2)
    w, Q = cswap(w, Q, 1, 2)
    return w, Q


def svd3x3_flip(F, sweeps: int | None = None):
    """Flip-aware SVD of (..., 3, 3) F.

    Returns (U, sigma, V): proper rotations U, V and sigma with
    sigma[..., 0] >= sigma[..., 1] >= |sigma[..., 2]|, sigma[..., 2]
    signed by det(F). F == U @ diag(sigma) @ V^T.
    """
    dtype = F.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    # Scale-normalize for robustness: Jacobi on F^T F squares the
    # condition number, so take out the magnitude first. NOTE: avoid
    # absolute clamps near f64's `tiny` — TPU emulated f64 only has f32
    # exponent range, so such constants flush to zero on device.
    scale = jnp.max(jnp.abs(F), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale > 0, scale, 1.0)
    Fn = F / scale

    A = jnp.swapaxes(Fn, -1, -2) @ Fn
    w, V = eigh3x3(A, sweeps)
    w, V = _sort3_desc(w, V)

    # det(V) = +1 already (product of rotations, column swaps in pairs
    # can flip it) — enforce.
    detV = jnp.linalg.det(V)
    V = V.at[..., :, 2].multiply(jnp.sign(detV)[..., None])

    B = Fn @ V  # columns b_i = sigma_i u_i
    tol = 16.0 * eps

    # u0
    n0 = jnp.linalg.norm(B[..., :, 0], axis=-1)
    e0 = jnp.zeros_like(B[..., :, 0]).at[..., 0].set(1.0)
    u0 = jnp.where((n0 > tol)[..., None], B[..., :, 0] / jnp.maximum(n0, tol)[..., None], e0)

    # u1: orthogonalize b1 against u0; fall back to any unit vector
    # orthogonal to u0 when degenerate.
    b1 = B[..., :, 1]
    b1o = b1 - jnp.sum(u0 * b1, axis=-1, keepdims=True) * u0
    n1 = jnp.linalg.norm(b1o, axis=-1)
    # fallback: cross u0 with the axis least aligned with it
    ax = jnp.argmin(jnp.abs(u0), axis=-1)
    alt = jax.nn.one_hot(ax, 3, dtype=dtype)
    fb = jnp.cross(u0, alt)
    fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), tol)
    u1 = jnp.where((n1 > tol * jnp.maximum(n0, 1.0))[..., None],
                   b1o / jnp.maximum(n1, tol)[..., None], fb)

    u2 = jnp.cross(u0, u1)  # right-handed => det(U) = +1

    U = jnp.stack([u0, u1, u2], axis=-1)
    s0 = n0
    s1 = jnp.sum(u1 * b1, axis=-1)
    s2 = jnp.sum(u2 * B[..., :, 2], axis=-1)  # signed by det(F)
    sigma = jnp.stack([s0, s1, s2], axis=-1) * scale[..., 0]
    return U, sigma, V


def make_pd3(A):
    """Project symmetric (..., 3, 3) to nearest PSD by clamping eigenvalues
    at zero (reference: IglUtils::makePD, src/Utils/IglUtils.hpp:253-268)."""
    w, Q = eigh3x3(A)
    w = jnp.maximum(w, 0.0)
    return (Q * w[..., None, :]) @ jnp.swapaxes(Q, -1, -2)


def make_pd2_lr(left, right):
    """PSD projection of the twist/flip blocks B = [[L+R, L-R], [L-R, L+R]].

    These matrices (reference: Energy.cpp:1149-1171) have eigenpairs
    (2L, [1,1]) and (2R, [1,-1]), so projection = clamping L and R at 0
    (equivalent to IglUtils::makePD2d on this family).
    Returns the clamped (left, right).
    """
    return jnp.maximum(left, 0.0), jnp.maximum(right, 0.0)
