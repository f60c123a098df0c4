"""DIM=2 pipeline tests: 2x2 flip-SVD properties, sigma-space derivative
FD checks (the dim-2 analog of Diagnostic mode 11, reference:
Energy.cpp:1279-1520 dim==2 instantiation), element gradient/Hessian vs
autodiff, and the spikes/Sharkey scenes end-to-end with a golden sysE
trajectory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dot_tpu.kernels import soa2d

MATS2 = list(soa2d.SOA2D_MATERIALS.values())
IDS2 = list(soa2d.SOA2D_MATERIALS.keys())


def _mats2(F):
    """(n, 2, 2) -> mat2 tuple."""
    return (F[:, 0, 0], F[:, 0, 1], F[:, 1, 0], F[:, 1, 1])


def _stack2(t):
    return np.stack([np.stack([t[0], t[1]], -1),
                     np.stack([t[2], t[3]], -1)], -2)


def test_svd2_flip_properties(rng):
    F = rng.normal(size=(64, 2, 2)) * 1.2
    F[0] = np.eye(2)
    F[1] = [[0.0, -1.0], [1.0, 0.0]]          # pure rotation
    F[2] = [[1.0, 0.0], [0.0, -2.0]]          # inverted
    U, s, V = soa2d.svd2_flip_soa(_mats2(jnp.asarray(F)))
    Um, Vm = _stack2([np.asarray(x) for x in U]), _stack2(
        [np.asarray(x) for x in V])
    s0, s1 = np.asarray(s[0]), np.asarray(s[1])
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(Um), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(Vm), 1.0, atol=1e-12)
    np.testing.assert_allclose(Um @ np.swapaxes(Um, 1, 2),
                               np.broadcast_to(np.eye(2), Um.shape),
                               atol=1e-12)
    # reconstruction
    rec = Um @ (np.stack([s0, s1], -1)[:, :, None]
                * np.swapaxes(Vm, 1, 2))
    np.testing.assert_allclose(rec, F, atol=1e-10)
    # ordering + signed inversion
    assert (s0 >= np.abs(s1) - 1e-12).all()
    det = np.linalg.det(F)
    np.testing.assert_allclose(s0 * s1, det, atol=1e-10)
    assert s1[2] < 0


def test_eigh2(rng):
    a, b, c = rng.normal(size=(3, 32))
    lam, Q = soa2d.eigh2_soa(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    A = np.stack([np.stack([a, b], -1), np.stack([b, c], -1)], -2)
    Qm = _stack2([np.asarray(x) for x in Q])
    lam0, lam1 = np.asarray(lam[0]), np.asarray(lam[1])
    rec = Qm @ (np.stack([lam0, lam1], -1)[:, :, None]
                * np.swapaxes(Qm, 1, 2))
    np.testing.assert_allclose(rec, A, atol=1e-10)
    assert (lam0 >= lam1).all()


def _sigma_cases(rng, n=24):
    s = np.concatenate([
        np.ones((2, 2)),
        rng.uniform(0.2, 2.5, size=(n, 2)),
        np.array([[1.5, -0.3]]),              # inverted
        np.array([[2.0, 1e-4]]),
    ])
    return jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1])


def _params(n):
    ym, pr = 1.0e5, 0.4
    u = jnp.full((n,), ym / (2.0 * (1.0 + pr)))
    lam = jnp.full((n,), ym * pr / ((1.0 + pr) * (1.0 - 2.0 * pr)))
    return u, lam


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_dpsi2_vs_autodiff(mat, rng):
    s0, s1 = _sigma_cases(rng)
    u, lam = _params(s0.shape[0])
    g = mat.dpsi((s0, s1), u, lam)

    def psi_of(sv, uu, ll):
        return mat.psi((sv[0], sv[1]), uu, ll)

    g_ad = jax.vmap(jax.grad(psi_of))(jnp.stack([s0, s1], -1), u, lam)
    np.testing.assert_allclose(np.stack([np.asarray(g[0]),
                                         np.asarray(g[1])], -1),
                               np.asarray(g_ad), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_d2psi2_vs_autodiff(mat, rng):
    s0, s1 = _sigma_cases(rng)
    u, lam = _params(s0.shape[0])
    h00, h01, h11 = mat.d2psi((s0, s1), u, lam)

    def psi_of(sv, uu, ll):
        return mat.psi((sv[0], sv[1]), uu, ll)

    H = jax.vmap(jax.hessian(psi_of))(jnp.stack([s0, s1], -1), u, lam)
    np.testing.assert_allclose(np.asarray(h00), np.asarray(H[:, 0, 0]),
                               rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h01), np.asarray(H[:, 0, 1]),
                               rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h11), np.asarray(H[:, 1, 1]),
                               rtol=1e-8, atol=1e-6)


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_b_left2_divided_difference(mat, rng):
    """BLeftCoef == (dPsi/ds0 - dPsi/ds1) / (2 (s0 - s1)) (reference:
    unitTest_BLeftCoef at dim 2)."""
    s0 = jnp.asarray(rng.uniform(0.3, 2.0, size=32))
    s1 = jnp.asarray(rng.uniform(0.3, 2.0, size=32))
    u, lam = _params(32)
    b = mat.b_left((s0, s1), u, lam)
    g = mat.dpsi((s0, s1), u, lam)
    dd = (g[0] - g[1]) / (2.0 * (s0 - s1))
    np.testing.assert_allclose(np.asarray(b), np.asarray(dd),
                               rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_first_piola2_vs_autodiff(mat, rng):
    F = jnp.asarray(rng.normal(size=(16, 2, 2)) * 0.3 + np.eye(2))
    u, lam = _params(16)
    f = _mats2(F)
    U, s, V = soa2d.svd2_flip_soa(f)
    P = _stack2([np.asarray(x)
                 for x in mat.first_piola(f, U, s, V, u, lam)])

    def psi_of_F(Fm):
        _, ss, _ = soa2d.svd2_flip_soa(
            (Fm[..., 0, 0], Fm[..., 0, 1], Fm[..., 1, 0], Fm[..., 1, 1]))
        return jnp.sum(mat.psi(ss, u, lam))

    P_ad = np.asarray(jax.grad(psi_of_F)(F))
    np.testing.assert_allclose(P, P_ad, rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------------------
# element-level: gradient and Hessian vs autodiff on a tiny triangle cloud
# ---------------------------------------------------------------------------
def _tri_cloud(rng, n=5):
    nv = 3 * n
    conn = np.arange(nv).reshape(n, 3)
    x = np.zeros((nv, 2))
    base = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    for e in range(n):
        th = rng.uniform(0, 2 * np.pi)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        x[conn[e]] = base @ R.T * rng.uniform(0.7, 1.4) + rng.normal(size=2)
    X0 = np.stack([x[conn[:, 1]] - x[conn[:, 0]],
                   x[conn[:, 2]] - x[conn[:, 0]]], axis=-1)
    det = np.linalg.det(X0)
    for e in np.where(det < 0)[0]:
        conn[e, [1, 2]] = conn[e, [2, 1]]
        X0[e] = np.stack([x[conn[e, 1]] - x[conn[e, 0]],
                          x[conn[e, 2]] - x[conn[e, 0]]], axis=-1)
    g = np.linalg.inv(X0)
    area = np.linalg.det(X0) / 2.0
    xd = x + 0.2 * rng.normal(size=x.shape)
    return (jnp.asarray(xd), conn, jnp.asarray(g), jnp.asarray(area))


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_element_gradient2_vs_autodiff(mat, rng):
    x, conn, g, area = _tri_cloud(rng)
    u, lam = _params(conn.shape[0])
    connT = tuple(jnp.asarray(conn[:, c]) for c in range(3))
    g4 = tuple(g[:, i, j] for i in range(2) for j in range(2))
    D = np.concatenate([-np.asarray(g).sum(axis=1, keepdims=True),
                        np.asarray(g)], axis=1)
    Dl = [[jnp.asarray(D[:, c, j]) for j in range(2)] for c in range(3)]

    def total_e(xv):
        f = soa2d.defgrad2_soa((xv[:, 0], xv[:, 1]), connT, g4)
        _, s, _ = soa2d.svd2_flip_soa(f)
        return jnp.sum(mat.psi(s, u, lam) * area)

    f = soa2d.defgrad2_soa((x[:, 0], x[:, 1]), connT, g4)
    U, s, V = soa2d.svd2_flip_soa(f)
    ge = soa2d.element_gradient2_soa(mat, f, U, s, V, Dl, u, lam, area)
    grad = np.zeros_like(np.asarray(x))
    for c in range(3):
        for d in range(2):
            np.add.at(grad[:, d], conn[:, c], np.asarray(ge[c][d]))
    g_ad = np.asarray(jax.grad(total_e)(x))
    np.testing.assert_allclose(grad, g_ad, rtol=1e-7, atol=1e-5)


@pytest.mark.parametrize("mat", MATS2, ids=IDS2)
def test_element_hessian2_vs_autodiff(mat, rng):
    """Unprojected 6x6 element Hessian == autodiff Hessian of w*Psi in
    the (corner, xy) dof order."""
    x, conn, g, area = _tri_cloud(rng, n=4)
    u, lam = _params(conn.shape[0])
    connT = tuple(jnp.asarray(conn[:, c]) for c in range(3))
    g4 = tuple(g[:, i, j] for i in range(2) for j in range(2))
    D = np.concatenate([-np.asarray(g).sum(axis=1, keepdims=True),
                        np.asarray(g)], axis=1)
    Dl = [[jnp.asarray(D[:, c, j]) for j in range(2)] for c in range(3)]

    f = soa2d.defgrad2_soa((x[:, 0], x[:, 1]), connT, g4)
    U, s, V = soa2d.svd2_flip_soa(f)
    H36 = soa2d.element_hessian2_soa(mat, U, s, V, Dl, u, lam, area,
                                     project_spd=False)
    H = np.stack([np.asarray(h) for h in H36],
                 axis=-1).reshape(-1, 6, 6)

    def elem_e(xe, e):
        xv = jnp.zeros((3, 2)).at[:].set(xe.reshape(3, 2))
        e1 = xv[1] - xv[0]
        e2 = xv[2] - xv[0]
        Xt = jnp.stack([e1, e2], axis=-1)
        Fm = Xt @ g[e]
        _, ss, _ = soa2d.svd2_flip_soa(
            (Fm[0, 0][None], Fm[0, 1][None], Fm[1, 0][None],
             Fm[1, 1][None]))
        return (mat.psi(ss, u[e][None], lam[e][None]) * area[e])[0]

    for e in range(conn.shape[0]):
        xe = jnp.asarray(np.asarray(x)[conn[e]].reshape(-1))
        H_ad = np.asarray(jax.hessian(lambda z: elem_e(z, e))(xe))
        scale = max(np.abs(H_ad).max(), 1.0)
        np.testing.assert_allclose(H[e] / scale, H_ad / scale, atol=5e-6)


# ---------------------------------------------------------------------------
# end-to-end 2D scenes
# ---------------------------------------------------------------------------
# spikes / stretch / FCR / dt=0.025 / E=1e5 / nu=0.4 / rho=1000 /
# resolution 200 / relTol 1e-5 (CPU f64, recorded 2026-08-18 round 4)
GOLDEN_2D_SPIKES_SYS_E = [
    3.294256031942e+03,
    3.294256605060e+03,
    3.300416677680e+03,
]


def _scene_2d(shape, script="stretch", resolution=200):
    from dot_tpu.config import Config
    from dot_tpu.dim2 import Mesh2D, System2D, Newton2DStepper
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper="Newton", dt=0.025,
                 rho=1000.0, ym=1e5, pr=0.4, script=script,
                 handle_ratio=0.03, shape=shape, resolution=resolution)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    system = System2D(mesh, cfg, dtype=jnp.float64)
    return Newton2DStepper(system, sd)


def test_spikes_stretch_golden():
    stepper = _scene_2d("spikes")
    st = stepper.init_state()
    vals = []
    for _ in range(len(GOLDEN_2D_SPIKES_SYS_E)):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    assert np.isfinite(vals).all()
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)


def _scene_2d_stepper(shape, stepper_t, n_parts=4, script="stretch",
                      resolution=200):
    from dot_tpu.config import Config
    from dot_tpu.dim2 import Mesh2D, System2D, build_plan_2d
    from dot_tpu.steppers.dot import DOTStepper
    from dot_tpu.steppers.lbfgs import LBFGSPD, LBFGSH
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper=stepper_t, dt=0.025,
                 rho=1000.0, ym=1e5, pr=0.4, script=script,
                 handle_ratio=0.03, shape=shape, resolution=resolution,
                 partition_amt=n_parts)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    if stepper_t == "DOT":
        plan = build_plan_2d(mesh, n_parts)
        return DOTStepper(System2D(mesh, cfg, dtype=jnp.float64,
                                   plan=plan), sd)
    if stepper_t == "LBFGSH":
        plan = build_plan_2d(mesh, 1)
        return LBFGSH(System2D(mesh, cfg, dtype=jnp.float64, plan=plan),
                      sd)
    return LBFGSPD(System2D(mesh, cfg, dtype=jnp.float64), sd)


def test_spikes_dot_matches_newton():
    """2D DOT (decomposed H0, interface completion, dup averaging,
    alpha-init) must converge to the same physics as 2D projected Newton
    at the same characteristic tolerance — the dim-2 analog of the
    cross-solver oracle (SURVEY §4 item 4; reference DIM=2
    instantiation: DOTTimeStepper.cpp:853). The sysE trace also pins the
    2D DOT path against the committed Newton golden."""
    stepN = _scene_2d("spikes")
    stepD = _scene_2d_stepper("spikes", "DOT", n_parts=4)
    assert stepD.system.n_parts == 4
    assert int(np.asarray(stepD.system.dup).max()) > 1  # real overlap
    stN, stD = stepN.init_state(), stepD.init_state()
    vals = []
    for _ in range(3):
        stN, _ = stepN.step(stN, 1e-5)
        stD, (stats, sys_e) = stepD.step(stD, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)
    xn, xd = np.asarray(stN.x), np.asarray(stD.x)
    scale = np.abs(xn).max()
    assert np.abs(xn - xd).max() < 2e-3 * scale
    np.testing.assert_allclose(xd[:, 2], 0.0, atol=1e-14)


def test_spikes_gsdd_2d_matches_newton():
    """2D GSDD: the sequential Gauss-Seidel sweep over 2D subdomains
    (solve_oneStep_GSDD at DIM=2) converges to the same physics."""
    from dot_tpu.config import Config
    from dot_tpu.dim2 import Mesh2D, System2D, build_plan_2d
    from dot_tpu.steppers.gsdd import GSDDStepper
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper="GSDD", dt=0.025, rho=1000.0,
                 ym=1e5, pr=0.4, script="stretch", handle_ratio=0.03,
                 shape="spikes", resolution=200, partition_amt=4)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = build_plan_2d(mesh, 4)
    stepper = GSDDStepper(System2D(mesh, cfg, dtype=jnp.float64,
                                   plan=plan), sd)
    st = stepper.init_state()
    vals = []
    for _ in range(3):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)


def test_spikes_lbfgspd_2d_converges():
    """2D LBFGS-PD: fixed Laplacian-type H0 (M + dt^2 D^T W D), one
    factor for the whole run (reference: LBFGSTimeStepper.cpp:113-194
    at DIM=2)."""
    stepP = _scene_2d_stepper("spikes", "LBFGS")
    st = stepP.init_state()
    vals = []
    for _ in range(3):
        st, (stats, sys_e) = stepP.step(st, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)
    assert np.isfinite(np.asarray(st.x)).all()


def test_sharkey_runs_and_z_stays_zero():
    stepper = _scene_2d("Sharkey")
    st = stepper.init_state()
    for _ in range(2):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
    x = np.asarray(st.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[:, 2], 0.0, atol=1e-14)
    # handles moved apart (stretch)
    m = stepper.system.mesh
    assert x[m.border_verts[1], 0].mean() > m.V_rest[m.border_verts[1],
                                                     0].mean()


def test_spikes_admm_2d_matches_newton():
    """2D ADMM-PD: the DIM=2 instantiation of the dimension-templated
    ADMM stepper (ADMMTimeStepper.cpp:736) — 2-dof sigma-space local
    Newton + dense scalar global factor with Overby weights — converges
    to the same physics as 2D projected Newton."""
    from dot_tpu.config import Config
    from dot_tpu.dim2 import Mesh2D, System2D, ADMMPD2D
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper="ADMM", dt=0.025, rho=1000.0,
                 ym=1e5, pr=0.4, script="stretch", handle_ratio=0.03,
                 shape="spikes", resolution=200)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    stepper = ADMMPD2D(System2D(mesh, cfg, dtype=jnp.float64), sd,
                       max_iter=1000)
    st = stepper.init_state()
    vals = []
    for _ in range(3):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(st.x)[:, 2], 0.0, atol=1e-14)


def test_spikes_lbfgsjh_2d_matches_newton():
    """2D LBFGS-JH: block-Jacobi initializer over a disjoint NODE
    partition (METIS::partMesh_nodes + LBFGSTimeStepper.cpp:70-95 at
    DIM=2) converges to the Newton golden."""
    from dot_tpu.config import Config
    from dot_tpu.dim2 import Mesh2D, System2D, build_node_plan_2d
    from dot_tpu.steppers.lbfgs import LBFGSJH
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper="LBFGSJH", dt=0.025,
                 rho=1000.0, ym=1e5, pr=0.4, script="stretch",
                 handle_ratio=0.03, shape="spikes", resolution=200,
                 partition_amt=4)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = build_node_plan_2d(mesh, 4)
    assert int(np.asarray(plan.dup).max()) == 1        # disjoint blocks
    stepper = LBFGSJH(System2D(mesh, cfg, dtype=jnp.float64, plan=plan),
                      sd)
    st = stepper.init_state()
    vals = []
    for _ in range(3):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        assert int(stats.inner_iters) > 0
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)


def test_spikes_admmdd_2d_matches_newton():
    """2D ADMM-DD: the DIM=2 instantiation of the dimension-templated
    ADMMDDTimeStepper (overlapping-subdomain consensus ADMM with frozen
    per-step interface weights; ADMMDDTimeStepper.cpp:595-701 at DIM=2)
    converges to the same physics as 2D projected Newton."""
    from dot_tpu.config import Config
    from dot_tpu.dim2 import (Mesh2D, System2D, ADMMDD2D, build_plan_2d)
    from dot_tpu import scripts

    cfg = Config(energy="FCR", time_stepper="ADMMDD", dt=0.025,
                 rho=1000.0, ym=1e5, pr=0.4, script="stretch",
                 handle_ratio=0.03, shape="spikes", resolution=200,
                 partition_amt=4)
    mesh = Mesh2D.from_config(cfg)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = build_plan_2d(mesh, 4)
    stepper = ADMMDD2D(System2D(mesh, cfg, dtype=jnp.float64, plan=plan),
                       sd, plan)
    assert int(np.asarray(stepper.is_dual).sum()) > 0  # real interfaces
    st = stepper.init_state()
    vals = []
    for _ in range(3):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        assert 0 < int(stats.inner_iters) < 1000
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_2D_SPIKES_SYS_E, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(st.x)[:, 2], 0.0, atol=1e-14)
