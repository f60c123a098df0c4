"""Batched per-element kernels: deformation gradient, energy, gradient,
and the 12x12 SPD-projected element Hessian.

This is the TPU-native form of the reference's hottest code path
(reference: src/Energy/Energy.cpp:294-780 — per-tet TBB loops + AVX2
batch SVD): every op below is batched over ALL elements at once, so XLA
fuses the whole chain F -> SVD -> Psi/P/H into large vector/matrix ops.

Definitions (reference: Mesh.cpp:620-633, Energy.cpp:389-423):
  F_e   = Xt_e @ restTriInv_e,  Xt columns = x_k - x_0 (k = 1..3)
  D_e   : (4, 3) corner basis with F_e = sum_c x_c (x) D_e[c, :]
          (row 0 = -column-sums of restTriInv; rows 1..3 = restTriInv rows)
  w_e   = triWeight_e * vol_e   (vol = det(X0)/6 for tets)

The diagonal-space Hessian construction follows Energy::compute_dP_div_dF
(reference: Energy.cpp:1129-1271): A = d2Psi/dsigma2 (SPD-projected via
closed-form eigendecomposition), three 2x2 twist/flip blocks from
BLeftCoef +- (dPsi/dsigma_i + dPsi/dsigma_j)/(2 (sigma_i + sigma_j)),
assembled into the rotated-basis 9x9 M, then congruence-transformed and
chain-ruled to vertices — here as two batched matmuls H = W M W^T with
W[(c,i),(a,b)] = U[i,a] (D V)[c,b], which is the MXU-friendly form.
"""

from __future__ import annotations

import jax.numpy as jnp

from .svd3 import svd3x3_flip, make_pd3, make_pd2_lr

# Reference guard for the twist-block denominator (Energy.cpp:1112-1117).
_SUM_SIGMA_EPS = 1.0e-6


def corner_basis(rest_tri_inv):
    """(nE, 4, 3) D with dF/dx_{c,d} = e_d (x) D[c, :]."""
    g = rest_tri_inv
    row0 = -jnp.sum(g, axis=-2, keepdims=True)  # (nE, 1, 3)
    return jnp.concatenate([row0, g], axis=-2)


def deformation_gradient(x, conn, rest_tri_inv):
    """F (nE, 3, 3) from positions x (nV, 3) and connectivity conn (nE, 4)."""
    xc = x[conn]  # (nE, 4, 3)
    xt = jnp.stack([xc[:, 1] - xc[:, 0],
                    xc[:, 2] - xc[:, 0],
                    xc[:, 3] - xc[:, 0]], axis=-1)  # columns
    return xt @ rest_tri_inv


def svd_of_F(F):
    """Flip-SVD of the batched deformation gradients."""
    return svd3x3_flip(F)


def energy_per_element(material, sigma, u, lam, w):
    """w_e * Psi(sigma_e) — reference: Energy::getEnergyValPerElemBySVD."""
    return material.psi(sigma, u, lam) * w


def element_gradient(material, F, U, sigma, V, D, u, lam, w):
    """(nE, 4, 3) per-corner gradient contributions: g[c] = D P^T rows.

    Reference: Energy::computeGradientByPK (Energy.cpp:704-737) = P * w
    chain-ruled through dF_div_dx_mult.
    """
    P = material.first_piola(F, U, sigma, V, u, lam) * w[..., None, None]
    return D @ jnp.swapaxes(P, -1, -2)


def _rotated_basis_M(material, sigma, u, lam, project_spd):
    """The 9x9 diagonal-space Hessian M in the rotated basis.

    Basis order is vec(F) row-major: index a*3+b. A lives on (0,4,8);
    twist/flip blocks couple (1,3), (5,7), (2,6)
    (reference: Energy.cpp:1176-1207).
    """
    A = material.d2psi_dsigma2(sigma, u, lam)
    if project_spd:
        A = make_pd3(A)

    dpsi = material.dpsi_dsigma(sigma, u, lam)
    left = material.b_left_coef(sigma, u, lam)

    def pair(ci, cj):
        ssum = sigma[..., ci] + sigma[..., cj]
        denom = jnp.where(ssum < _SUM_SIGMA_EPS, _SUM_SIGMA_EPS, ssum)
        return (dpsi[..., ci] + dpsi[..., cj]) / (2.0 * denom)

    rights = jnp.stack([pair(0, 1), pair(1, 2), pair(2, 0)], axis=-1)
    if project_spd:
        left, rights = make_pd2_lr(left, rights)

    batch = sigma.shape[:-1]
    M = jnp.zeros(batch + (9, 9), dtype=sigma.dtype)
    # A block on the diagonal-entry coordinates
    diag_idx = (0, 4, 8)
    for ai, a in enumerate(diag_idx):
        for bi, b in enumerate(diag_idx):
            M = M.at[..., a, b].set(A[..., ai, bi])
    # twist/flip blocks: B_k = [[L+R, L-R], [L-R, L+R]] on coordinate pairs
    for k, (p, q) in enumerate(((1, 3), (5, 7), (2, 6))):
        lpr = left[..., k] + rights[..., k]
        lmr = left[..., k] - rights[..., k]
        M = M.at[..., p, p].set(lpr)
        M = M.at[..., q, q].set(lpr)
        M = M.at[..., p, q].set(lmr)
        M = M.at[..., q, p].set(lmr)
    return M


def element_hessian(material, U, sigma, V, D, u, lam, w, project_spd=True):
    """(nE, 12, 12) element Hessian, dof order (corner, xyz).

    Reference: Energy::computeHessianByPK (Energy.cpp:738-780) —
    compute_dP_div_dF chain-ruled twice with restTriInv.
    """
    M = _rotated_basis_M(material, sigma, u, lam, project_spd)
    DV = D @ V  # (nE, 4, 3)
    # W[(c,i),(a,b)] = U[i,a] * DV[c,b]
    W = jnp.einsum("...ia,...cb->...ciab", U, DV)
    W = W.reshape(W.shape[:-4] + (12, 9))
    H = W @ M @ jnp.swapaxes(W, -1, -2)
    return H * w[..., None, None]


def element_quadratic_form(H12, p, conn):
    """sum_e p_e^T H_e p_e with p (nV, 3) gathered by conn (nE, 4).

    Used for the DOT alpha-init step size -g.p / p^T H p
    (reference: Optimizer.cpp:1075-1093 via linSysSolver->multiply).
    Fixed-vertex dofs of p must be zero (identity rows then contribute 0).
    """
    pe = p[conn].reshape(conn.shape[0], 12)
    return jnp.sum(pe * jnp.einsum("eij,ej->ei", H12, pe))
