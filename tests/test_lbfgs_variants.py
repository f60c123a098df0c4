"""Cross-solver agreement: the LBFGS-{PD,H,HI,JH} initializers all minimize
the same incremental potential to the same characteristic tolerance, so
their trajectories and system energies must agree with DOT's (the
reference's de-facto integration test, input/otherMethods/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.config import Config
from dot_tpu import partition, scripts
from dot_tpu.steppers import (System, DOTStepper, LBFGSPD, LBFGSH, LBFGSHI,
                              LBFGSJH)


def _scene():
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.05)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()
    return mesh, cfg, sd


def _run(stepper, n=3):
    st = stepper.init_state()
    for _ in range(n):
        st, (stats, sys_e) = stepper.step(st)
    return st, stats, float(sys_e)


@pytest.fixture(scope="module")
def dot_result():
    mesh, cfg, sd = _scene()
    plan = partition.build_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48)
    stepper = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    return _run(stepper)


def _check_against_dot(st, stats, sys_e, dot_result, x_tol=2e-3):
    st_d, _, sys_e_d = dot_result
    assert bool(jnp.isfinite(st.x).all())
    np.testing.assert_allclose(sys_e, sys_e_d, rtol=1e-3)
    assert float(jnp.abs(st.x - st_d.x).max()) < x_tol


def test_lbfgs_pd(dot_result):
    mesh, cfg, sd = _scene()
    stepper = LBFGSPD(System(mesh, cfg, None, dtype=jnp.float64), sd)
    _check_against_dot(*_run(stepper), dot_result)


def test_lbfgs_h(dot_result):
    mesh, cfg, sd = _scene()
    plan = partition.build_plan(mesh, 1, pad_elem_to=16, pad_n3_to=48)
    stepper = LBFGSH(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    _check_against_dot(*_run(stepper), dot_result)


def test_lbfgs_hi_bf16_factor(dot_result):
    mesh, cfg, sd = _scene()
    plan = partition.build_plan(mesh, 1, pad_elem_to=16, pad_n3_to=48)
    stepper = LBFGSHI(System(mesh, cfg, plan, dtype=jnp.float64,
                             factor_dtype=jnp.bfloat16), sd)
    _check_against_dot(*_run(stepper), dot_result, x_tol=5e-3)


def test_lbfgs_jh(dot_result):
    mesh, cfg, sd = _scene()
    plan = partition.build_node_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48)
    assert plan.dup.max() == 1  # disjoint node blocks
    stepper = LBFGSJH(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    # block-Jacobi is the weakest H0: the early stop lands a bit farther
    st, stats, sys_e = _run(stepper)
    st_d, _, sys_e_d = dot_result
    assert bool(jnp.isfinite(st.x).all())
    np.testing.assert_allclose(sys_e, sys_e_d, rtol=5e-3)
    assert float(jnp.abs(st.x - st_d.x).max()) < 5e-3
