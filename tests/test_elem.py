"""Element kernel checks: gradient vs autodiff, Hessian vs FD of gradient.

Mirrors the reference's latent FD integration checks
(Energy::checkGradient/checkHessian, reference: Energy.cpp:169-291).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dot_tpu.materials import MATERIALS
from dot_tpu.kernels import elem
from dot_tpu.kernels.svd3 import svd3x3_flip

MATS = list(MATERIALS.values())


def _tiny_tet_cloud(rng, n_elem=6):
    """A few random well-shaped tets with shared-nothing connectivity."""
    nv = 4 * n_elem
    conn = np.arange(nv, dtype=np.int32).reshape(n_elem, 4)
    x_rest = np.zeros((nv, 3))
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    for e in range(n_elem):
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        x_rest[conn[e]] = base @ Q.T * rng.uniform(0.5, 1.5) + rng.normal(size=3)
    # rest-shape inverse and volume
    rti = np.zeros((n_elem, 3, 3))
    vol = np.zeros(n_elem)
    for e in range(n_elem):
        X0 = (x_rest[conn[e, 1:]] - x_rest[conn[e, 0]]).T
        if np.linalg.det(X0) < 0:  # keep positive orientation
            conn[e, [1, 2]] = conn[e, [2, 1]]
            X0 = (x_rest[conn[e, 1:]] - x_rest[conn[e, 0]]).T
        rti[e] = np.linalg.inv(X0)
        vol[e] = np.linalg.det(X0) / 6.0
    x = x_rest + 0.25 * rng.normal(size=x_rest.shape)
    return (jnp.asarray(x), jnp.asarray(conn), jnp.asarray(rti), jnp.asarray(vol))


def _total_energy(mat, x, conn, rti, vol, u, lam):
    F = elem.deformation_gradient(x, conn, rti)
    _, s, _ = svd3x3_flip(F)
    return jnp.sum(elem.energy_per_element(mat, s, u, lam, vol))


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_element_gradient_vs_autodiff(mat, rng):
    x, conn, rti, vol = _tiny_tet_cloud(rng)
    n_elem = conn.shape[0]
    u = jnp.full((n_elem,), 4.0e4)
    lam = jnp.full((n_elem,), 8.0e4)

    F = elem.deformation_gradient(x, conn, rti)
    U, s, V = svd3x3_flip(F)
    D = elem.corner_basis(rti)
    g_elem = elem.element_gradient(mat, F, U, s, V, D, u, lam, vol)
    g = np.zeros_like(np.asarray(x))
    np.add.at(g, np.asarray(conn).ravel(), np.asarray(g_elem).reshape(-1, 3))

    # FD of the total energy (the SVD is not AD-safe), batched over all dofs
    h = 1e-6
    nv = x.shape[0]
    eye = jnp.eye(nv * 3, dtype=x.dtype).reshape(nv * 3, nv, 3) * h
    e_fn = jax.jit(jax.vmap(lambda xx: _total_energy(mat, xx, conn, rti, vol, u, lam)))
    g_fd = ((np.asarray(e_fn(x[None] + eye)) - np.asarray(e_fn(x[None] - eye)))
            / (2 * h)).reshape(nv, 3)
    scale = max(np.abs(g).max(), 1.0)
    np.testing.assert_allclose(g / scale, g_fd / scale, atol=5e-5)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_element_hessian_vs_fd(mat, rng):
    """Unprojected element Hessian == FD of the element gradient."""
    x, conn, rti, vol = _tiny_tet_cloud(rng, n_elem=3)
    n_elem = conn.shape[0]
    u = jnp.full((n_elem,), 4.0e4)
    lam = jnp.full((n_elem,), 8.0e4)
    D = elem.corner_basis(rti)

    @jax.jit
    def elem_grad_flat(xf):
        F = elem.deformation_gradient(xf, conn, rti)
        U, s, V = svd3x3_flip(F)
        return elem.element_gradient(mat, F, U, s, V, D, u, lam, vol).reshape(n_elem, 12)

    F = elem.deformation_gradient(x, conn, rti)
    U, s, V = svd3x3_flip(F)
    H = np.asarray(elem.element_hessian(mat, U, s, V, D, u, lam, vol,
                                        project_spd=False))

    # elements share no vertices here, so one perturbation per (corner, dim)
    # moves every element's dof at once
    h = 1e-6
    H_fd = np.zeros_like(H)
    for c in range(4):
        for d in range(3):
            dx = jnp.zeros_like(x).at[conn[:, c], d].set(h)
            gp = np.asarray(elem_grad_flat(x + dx))
            gm = np.asarray(elem_grad_flat(x - dx))
            H_fd[:, :, c * 3 + d] = (gp - gm) / (2 * h)
    scale = max(np.abs(H).max(), 1.0)
    np.testing.assert_allclose(H / scale, H_fd / scale, atol=2e-4)


@pytest.mark.parametrize("mat", MATS, ids=[m.name for m in MATS])
def test_projected_hessian_is_psd(mat, rng):
    x, conn, rti, vol = _tiny_tet_cloud(rng, n_elem=8)
    n_elem = conn.shape[0]
    u = jnp.full((n_elem,), 4.0e4)
    lam = jnp.full((n_elem,), 8.0e4)
    # stress it with a heavily compressed/inverted configuration
    x = x * jnp.asarray([1.0, -0.3, 0.6])
    F = elem.deformation_gradient(x, conn, rti)
    U, s, V = svd3x3_flip(F)
    D = elem.corner_basis(rti)
    H = np.asarray(elem.element_hessian(mat, U, s, V, D, u, lam, vol,
                                        project_spd=True))
    w = np.linalg.eigvalsh(0.5 * (H + np.swapaxes(H, -1, -2)))
    assert w.min() >= -1e-6 * max(1.0, np.abs(H).max())


def test_quadratic_form_matches_dense(rng):
    x, conn, rti, vol = _tiny_tet_cloud(rng, n_elem=5)
    n_elem = conn.shape[0]
    nv = int(np.asarray(conn).max()) + 1
    u = jnp.full((n_elem,), 4.0e4)
    lam = jnp.full((n_elem,), 8.0e4)
    F = elem.deformation_gradient(x, conn, rti)
    U, s, V = svd3x3_flip(F)
    D = elem.corner_basis(rti)
    H = elem.element_hessian(mat := MATS[0], U, s, V, D, u, lam, vol)
    p = jnp.asarray(rng.normal(size=(nv, 3)))
    q = float(elem.element_quadratic_form(H, p, conn))

    # dense reference
    Hd = np.zeros((nv * 3, nv * 3))
    Hn = np.asarray(H)
    cn = np.asarray(conn)
    for e in range(n_elem):
        dofs = (cn[e][:, None] * 3 + np.arange(3)[None, :]).ravel()
        Hd[np.ix_(dofs, dofs)] += Hn[e]
    pf = np.asarray(p).ravel()
    np.testing.assert_allclose(q, pf @ Hd @ pf, rtol=1e-9)
