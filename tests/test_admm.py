"""ADMM-PD agreement with DOT on the same scene (reference: the
otherMethods cross-solver suite)."""

import numpy as np
import jax.numpy as jnp

from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.config import Config
from dot_tpu import partition, scripts
from dot_tpu.steppers import System, DOTStepper, ADMMPDStepper


def test_admm_pd_matches_dot():
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.05)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()

    admm = ADMMPDStepper(System(mesh, cfg, None, dtype=jnp.float64), sd,
                         max_iter=1000)
    sa = admm.init_state()

    plan = partition.build_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48)
    dot = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = dot.init_state()

    for _ in range(2):
        sa, (stats_a, sys_e_a) = admm.step(sa)
        st, (stats_d, sys_e_d) = dot.step(st)

    assert bool(jnp.isfinite(sa.x).all())
    # ADMM converged to the same characteristic tolerance
    tol = admm.system.target_g_res(1e-5)
    assert float(stats_a.sqn_g) < tol
    assert int(stats_a.inner_iters) < 1000
    np.testing.assert_allclose(float(sys_e_a), float(sys_e_d), rtol=1e-3)
    assert float(jnp.abs(sa.x - st.x).max()) < 2e-3


def test_gsdd_matches_dot():
    from dot_tpu.steppers import GSDDStepper
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.05)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()

    plan = partition.build_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48)
    gs = GSDDStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    sg = gs.init_state()
    dot = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = dot.init_state()
    for _ in range(2):
        sg, (stats_g, sys_e_g) = gs.step(sg)
        st, (stats_d, sys_e_d) = dot.step(st)
    assert bool(jnp.isfinite(sg.x).all())
    # GS sweeps stop at their own early-exit point: slightly looser band
    np.testing.assert_allclose(float(sys_e_g), float(sys_e_d), rtol=3e-3)
    assert float(jnp.abs(sg.x - st.x).max()) < 3e-3


def test_admm_dd_matches_dot():
    from dot_tpu.steppers import ADMMDDStepper
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.05)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()

    plan = partition.build_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48,
                                own_plan=True)
    ap = partition.build_admm_dd_plan(mesh, plan)
    dd = ADMMDDStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd, ap)
    s_dd = dd.init_state()
    dot = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = dot.init_state()
    for _ in range(2):
        s_dd, (stats_dd, sys_e_dd) = dd.step(s_dd)
        st, (stats_d, sys_e_d) = dot.step(st)
    assert bool(jnp.isfinite(s_dd.x).all())
    tol = dd.system.target_g_res(1e-5)
    assert float(stats_dd.sqn_g) < tol, (float(stats_dd.sqn_g), tol,
                                         int(stats_dd.inner_iters))
    np.testing.assert_allclose(float(sys_e_dd), float(sys_e_d), rtol=1e-3)
    assert float(jnp.abs(s_dd.x - st.x).max()) < 2e-3


def test_compact_w_matches_dense():
    """w_matvec / w_add_dense / w_diag must reproduce the densified W
    (scatter + mass-diff diagonal + free-mask) exactly."""
    from dot_tpu.steppers import ADMMDDStepper
    from dot_tpu.mesh_gen import bar_mesh

    mesh = bar_mesh(6, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 3, pad_elem_to=16, pad_n3_to=48,
                                own_plan=True)
    ap = partition.build_admm_dd_plan(mesh, plan)
    sys_ = System(mesh, cfg, plan, dtype=jnp.float64)
    dd = ADMMDDStepper(sys_, sd, ap)

    fixed = jnp.asarray(sd.fixed0)
    x = jnp.asarray(sd.x0)
    _, wv, _, _ = dd.update_weights(x, fixed)
    free3f = dd._free3(fixed).reshape(-1)
    P, n3 = sys_.n_parts, sys_.n3

    # densify the same way the pre-compact implementation did
    W = np.zeros((P * n3 * n3,))
    np.add.at(W, np.asarray(dd.w_udest),
              np.asarray(dd._w_masked(wv, free3f)))
    W = W.reshape(P, n3, n3)
    idx = np.arange(n3)
    W[:, idx, idx] += np.asarray(dd._md3f(free3f)).reshape(P, n3)

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(P, n3)))
    np.testing.assert_allclose(np.asarray(dd.w_matvec(wv, free3f, v)),
                               np.einsum("pij,pj->pi", W, np.asarray(v)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dd.w_diag(wv, free3f)),
                               W[:, idx, idx].reshape(-1),
                               rtol=1e-12, atol=1e-12)
    H0 = jnp.asarray(rng.normal(size=(P, n3, n3)))
    np.testing.assert_allclose(np.asarray(dd.w_add_dense(H0, wv, free3f)),
                               np.asarray(H0) + W, rtol=1e-12, atol=1e-12)


def test_admm_dd_banded_matches_dense():
    """The RCM-banded augmented local factor (assemble_own_btd_flat + W
    banded scatter + BTD solve) must reproduce the dense local-factor
    trajectory: same matrix content below the diagonal, exact
    factorization on both paths (f64)."""
    from dot_tpu.steppers import ADMMDDStepper

    mesh = bar_mesh(18, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()

    steppers = []
    for banded in (False, True):
        plan = partition.build_plan(
            mesh, 3, pad_elem_to=16, pad_n3_to=48, own_plan=True,
            banded=banded, band_bs_unit=48, band_min_nb=3)
        if banded:
            assert plan.band_nb >= 3, "test mesh must take the banded path"
            assert plan.own_band_dest is not None
        ap = partition.build_admm_dd_plan(mesh, plan)
        if banded:
            assert ap.w_band_dest is not None
        st = ADMMDDStepper(System(mesh, cfg, plan, dtype=jnp.float64),
                           sd, ap)
        steppers.append((st, st.init_state()))

    (dd_d, s_d), (dd_b, s_b) = steppers
    assert not dd_d.banded_local and dd_b.banded_local
    for _ in range(2):
        s_d, (st_d, e_d) = dd_d.step(s_d)
        s_b, (st_b, e_b) = dd_b.step(s_b)
    assert int(st_b.inner_iters) == int(st_d.inner_iters)
    np.testing.assert_allclose(float(e_b), float(e_d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s_b.x), np.asarray(s_d.x),
                               rtol=1e-7, atol=1e-8)
