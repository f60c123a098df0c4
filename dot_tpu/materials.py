"""Hyperelastic material models in singular-value (diagonal) space.

Each material provides the five diagonal-space primitives the reference
defines on its `Energy` base class (reference: src/Energy/Energy.hpp:193-217):

- ``psi(sigma, u, lam)``            -> scalar energy density
- ``dpsi_dsigma(sigma, u, lam)``    -> (..., 3)
- ``d2psi_dsigma2(sigma, u, lam)``  -> (..., 3, 3)
- ``b_left_coef(sigma, u, lam)``    -> (..., 3) twist-block left coefficients
- ``first_piola(F, U, sigma, V)``   -> (..., 3, 3) P = dPsi/dF

All functions are pure jnp, broadcast over leading batch dims, and are used
both by the batched element kernels (vmapped over all tets) and directly by
the diagonal-space unit tests (reference: src/Energy/Energy.cpp:1279-1520,
run by Diagnostic mode 11).

Conventions: ``sigma`` follows the flip-SVD convention (descending by
magnitude, the last entry signed negative under inversion); ``u``/``lam``
are the per-element Lame parameters u = E/(2(1+nu)),
lam = E*nu/((1+nu)(1-2nu)) (reference: src/Mesh.cpp:740-745).
"""

from __future__ import annotations

import jax.numpy as jnp


def cofactor3(F):
    """Cofactor matrix C with C[i, j] = dJ/dF[i, j] (J = det F).

    Columns are cross products of the other two columns of F
    (reference: IglUtils::computeCofactorMtr used by
    FixedCoRotEnergy.cpp:173-183).
    """
    c0 = jnp.cross(F[..., :, 1], F[..., :, 2])
    c1 = jnp.cross(F[..., :, 2], F[..., :, 0])
    c2 = jnp.cross(F[..., :, 0], F[..., :, 1])
    return jnp.stack([c0, c1, c2], axis=-1)


def _sigma_prod_noi(sigma):
    """(..., 3) products of the other two singular values."""
    s0, s1, s2 = sigma[..., 0], sigma[..., 1], sigma[..., 2]
    return jnp.stack([s1 * s2, s2 * s0, s0 * s1], axis=-1)


class FixedCoRot:
    """Fixed Co-Rotational: Psi = u*||sigma-1||^2 + lam/2*(J-1)^2.

    Reference: src/Energy/Physics_Elasticity/FixedCoRotEnergy.cpp:82-183.
    """

    name = "FCR"
    # Both shipped materials rebuild the Hessian every Newton iteration
    # (reference: FixedCoRotEnergy.cpp:285-295).
    need_refactorize = True

    @staticmethod
    def psi(sigma, u, lam):
        sm1 = sigma - 1.0
        j_m1 = jnp.prod(sigma, axis=-1) - 1.0
        return u * jnp.sum(sm1 * sm1, axis=-1) + 0.5 * lam * j_m1 * j_m1

    @staticmethod
    def dpsi_dsigma(sigma, u, lam):
        j_m1_lam = lam[..., None] * (jnp.prod(sigma, axis=-1, keepdims=True) - 1.0)
        return 2.0 * u[..., None] * (sigma - 1.0) + _sigma_prod_noi(sigma) * j_m1_lam

    @staticmethod
    def d2psi_dsigma2(sigma, u, lam):
        sp = _sigma_prod_noi(sigma)
        prod = jnp.prod(sigma, axis=-1)
        diag = 2.0 * u[..., None] + lam[..., None] * sp * sp
        # off-diagonal (i, j): lam * (sigma_k*(J-1) + sp_i*sp_j), k = other
        pm1 = prod - 1.0
        h01 = lam * (sigma[..., 2] * pm1 + sp[..., 0] * sp[..., 1])
        h02 = lam * (sigma[..., 1] * pm1 + sp[..., 0] * sp[..., 2])
        h12 = lam * (sigma[..., 0] * pm1 + sp[..., 2] * sp[..., 1])
        return _sym3_from_parts(diag, h01, h02, h12)

    @staticmethod
    def b_left_coef(sigma, u, lam):
        pm1 = jnp.prod(sigma, axis=-1, keepdims=True) - 1.0
        half_lam = 0.5 * lam[..., None]
        # pair (0,1) uses sigma2; (1,2) uses sigma0; (2,0) uses sigma1
        s_other = jnp.stack([sigma[..., 2], sigma[..., 0], sigma[..., 1]], axis=-1)
        return u[..., None] - half_lam * s_other * pm1

    @staticmethod
    def first_piola(F, U, sigma, V, u, lam):
        R = U @ jnp.swapaxes(V, -1, -2)
        j_m1 = jnp.prod(sigma, axis=-1) - 1.0
        return (2.0 * u[..., None, None] * (F - R)
                + (lam * j_m1)[..., None, None] * cofactor3(F))


class StableNeoHookean:
    """Stable Neo-Hookean (no-log variant, the reference default):
    Psi = u/2*(||sigma||^2 - 3) + lam/2*(J - alpha)^2, alpha = 1 + u/lam.

    Reference: src/Energy/Physics_Elasticity/StableNHEnergy.cpp:79-251
    (SNH_WITHLOG is off by default, src/Types.hpp:36).
    """

    name = "SNH"
    need_refactorize = True

    @staticmethod
    def _alpha(u, lam):
        return 1.0 + u / lam

    @staticmethod
    def psi(sigma, u, lam):
        j_ma = jnp.prod(sigma, axis=-1) - StableNeoHookean._alpha(u, lam)
        return 0.5 * (u * (jnp.sum(sigma * sigma, axis=-1) - 3.0) + lam * j_ma * j_ma)

    @staticmethod
    def dpsi_dsigma(sigma, u, lam):
        j_ma = jnp.prod(sigma, axis=-1) - StableNeoHookean._alpha(u, lam)
        term2 = (lam * j_ma)[..., None]
        return sigma * u[..., None] + term2 * _sigma_prod_noi(sigma)

    @staticmethod
    def d2psi_dsigma2(sigma, u, lam):
        sp = _sigma_prod_noi(sigma)
        diag = u[..., None] + lam[..., None] * sp * sp
        lam2jma = lam * (2.0 * jnp.prod(sigma, axis=-1) - StableNeoHookean._alpha(u, lam))
        h01 = sigma[..., 2] * lam2jma
        h02 = sigma[..., 1] * lam2jma
        h12 = sigma[..., 0] * lam2jma
        return _sym3_from_parts(diag, h01, h02, h12)

    @staticmethod
    def b_left_coef(sigma, u, lam):
        j_ma = jnp.prod(sigma, axis=-1, keepdims=True) - StableNeoHookean._alpha(u, lam)[..., None]
        term0 = lam[..., None] * j_ma
        s_other = jnp.stack([sigma[..., 2], sigma[..., 0], sigma[..., 1]], axis=-1)
        return 0.5 * (u[..., None] - term0 * s_other)

    @staticmethod
    def first_piola(F, U, sigma, V, u, lam):
        j_ma = jnp.prod(sigma, axis=-1) - StableNeoHookean._alpha(u, lam)
        return u[..., None, None] * F + (lam * j_ma)[..., None, None] * cofactor3(F)


class StableNeoHookeanWithLog:
    """Stable Neo-Hookean, regularized-log variant (the reference's
    compile-time SNH_WITHLOG build, src/Types.hpp:36):

      Psi = u/2*(||sigma||^2 - 3 - log(||sigma||^2 + 1))
            + lam/2*(J - alpha)^2,  alpha = 1 + 3u/(4 lam).

    Reference: StableNHEnergy.cpp:84-96 (psi), :102-114 (dpsi),
    :134-170 (d2psi), :204-216 (BLeftCoef), :237-243 (P). The log term
    uses log(I_C + 1), which is defined for every F (including
    inversion) — no sigma > 0 barrier exists on this variant, so the
    line search needs no domain guard. Exposed as `energy SNHWL` in
    scene scripts (a config extension: the reference selects it at
    compile time, not in the script grammar).
    """

    name = "SNHWL"
    need_refactorize = True

    @staticmethod
    def _alpha(u, lam):
        return 1.0 + 0.75 * u / lam

    @staticmethod
    def psi(sigma, u, lam):
        s_sq = jnp.sum(sigma * sigma, axis=-1)
        j_ma = jnp.prod(sigma, axis=-1) - StableNeoHookeanWithLog._alpha(u, lam)
        return 0.5 * (u * (s_sq - 3.0 - jnp.log1p(s_sq)) + lam * j_ma * j_ma)

    @staticmethod
    def dpsi_dsigma(sigma, u, lam):
        s_sq = jnp.sum(sigma * sigma, axis=-1, keepdims=True)
        t1 = u[..., None] * (1.0 - 1.0 / (s_sq + 1.0))
        j_ma = (jnp.prod(sigma, axis=-1, keepdims=True)
                - StableNeoHookeanWithLog._alpha(u, lam)[..., None])
        return sigma * t1 + (lam[..., None] * j_ma) * _sigma_prod_noi(sigma)

    @staticmethod
    def d2psi_dsigma2(sigma, u, lam):
        sp = _sigma_prod_noi(sigma)
        s_sq1 = jnp.sum(sigma * sigma, axis=-1) + 1.0
        t1 = u * (1.0 - 1.0 / s_sq1)
        # d t1 / d sigma_j = 2 u sigma_j / (S+1)^2
        curv = (2.0 * u / (s_sq1 * s_sq1))[..., None] * sigma
        lam2jma = lam * (2.0 * jnp.prod(sigma, axis=-1)
                         - StableNeoHookeanWithLog._alpha(u, lam))
        diag = t1[..., None] + sigma * curv + lam[..., None] * sp * sp
        h01 = sigma[..., 0] * curv[..., 1] + sigma[..., 2] * lam2jma
        h02 = sigma[..., 0] * curv[..., 2] + sigma[..., 1] * lam2jma
        h12 = sigma[..., 1] * curv[..., 2] + sigma[..., 0] * lam2jma
        return _sym3_from_parts(diag, h01, h02, h12)

    @staticmethod
    def b_left_coef(sigma, u, lam):
        s_sq = jnp.sum(sigma * sigma, axis=-1, keepdims=True)
        t1 = u[..., None] * (1.0 - 1.0 / (s_sq + 1.0))
        j_ma = (jnp.prod(sigma, axis=-1, keepdims=True)
                - StableNeoHookeanWithLog._alpha(u, lam)[..., None])
        term0 = lam[..., None] * j_ma
        s_other = jnp.stack([sigma[..., 2], sigma[..., 0], sigma[..., 1]], axis=-1)
        return 0.5 * (t1 - term0 * s_other)

    @staticmethod
    def first_piola(F, U, sigma, V, u, lam):
        s_sq = jnp.sum(sigma * sigma, axis=-1)
        t1 = u * (1.0 - 1.0 / (s_sq + 1.0))
        j_ma = jnp.prod(sigma, axis=-1) - StableNeoHookeanWithLog._alpha(u, lam)
        return (t1[..., None, None] * F
                + (lam * j_ma)[..., None, None] * cofactor3(F))


def _sym3_from_parts(diag, h01, h02, h12):
    """Assemble (..., 3, 3) symmetric matrix from diagonal and off-diag parts."""
    row0 = jnp.stack([diag[..., 0], h01, h02], axis=-1)
    row1 = jnp.stack([h01, diag[..., 1], h12], axis=-1)
    row2 = jnp.stack([h02, h12, diag[..., 2]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


MATERIALS = {
    "FCR": FixedCoRot,
    "SNH": StableNeoHookean,
    "SNHWL": StableNeoHookeanWithLog,
}


def get_material(name: str):
    try:
        return MATERIALS[name]
    except KeyError:
        raise ValueError(f"unknown energy type {name!r}; expected one of {list(MATERIALS)}")


def bulk_modulus(u, lam):
    """Reference: Energy::getBulkModulus (src/Energy/Energy.cpp:1273-1277)."""
    return lam + u * 2.0 / 3.0
