"""Golden-trajectory regression: deterministic scenes under DOT/f64 must
reproduce the recorded system energies (the reference's de-facto oracle —
sysE logging, Optimizer.cpp:1310-1328).

Guards against silent numerical regressions in the kernel/solver stack.
Bar recorded 2026-08-16 (CPU f64, round 1); bunny5K recorded 2026-08-18
(CPU f64, round 3 — a real reference mesh, 19K tets, exercising the
RCM-banded factor path at production shapes)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.config import Config
from dot_tpu import partition, scripts
from dot_tpu.mesh import Mesh
from dot_tpu.io import read_tet_mesh
from dot_tpu.steppers import System, DOTStepper

GOLDEN_SYS_E = [
    7.529949140714e+01,
    7.420914838503e+01,
    7.326224468377e+01,
    7.243233402989e+01,
    7.174690962232e+01,
]


def test_golden_bar_twist_dot():
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="twist", handle_ratio=0.05)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "twist")
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 4, pad_elem_to=16, pad_n3_to=48)
    stepper = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = stepper.init_state()
    vals = []
    for _ in range(len(GOLDEN_SYS_E)):
        st, (stats, sys_e) = stepper.step(st)
        vals.append(float(sys_e))
    # loose band: line-search decisions may shift with benign kernel
    # changes; a real regression moves sysE at the 1e-3+ level
    np.testing.assert_allclose(vals, GOLDEN_SYS_E, rtol=2e-4)


from refpaths import ref_path

BUNNY = ref_path("input", "tetMeshes", "bunny5K.msh")

# DOT6 / FCR / twistnsns / dt=0.025 / E=1e5 / nu=0.4 / rho=1000,
# relTol 1e-5, handleRatio 0.01 (the reference default, Config.cpp:36 —
# the bunny5K reference scenes omit handleRatio, so 0.01 applies there;
# recorded 2026-08-18, CPU f64, round 4)
GOLDEN_BUNNY_SYS_E = [
    4.348708211833e+04,
    4.351190919746e+04,
    4.362639457426e+04,
]


# Same scene/recipe as the DOT trace, other stepper families (recorded
# 2026-08-18, CPU f64, round 4). Frame-0 sysE agrees across all four
# families to ~5 digits — the cross-solver oracle (SURVEY §4 item 4).
GOLDEN_BUNNY_GSDD = [
    4.348706494717e+04,
    4.351155127661e+04,
    4.362641252897e+04,
]
GOLDEN_BUNNY_LBFGSJH = [
    4.348725355617e+04,
    4.351257401907e+04,
    4.362776120993e+04,
]
GOLDEN_BUNNY_ADMMDD = [
    4.348703742999e+04,
    4.351134683839e+04,
]


def _bunny_scene():
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="twistnsns", handle_ratio=0.01)
    mesh = Mesh(*read_tet_mesh(BUNNY), ym=cfg.ym, pr=cfg.pr, rho=cfg.rho)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    return cfg, mesh, sd


def _run_golden(stepper, n, golden):
    st = stepper.init_state()
    vals = []
    for _ in range(n):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, golden, rtol=2e-4)


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="reference data absent")
def test_golden_bunny5k_gsdd():
    from dot_tpu.steppers import GSDDStepper
    cfg, mesh, sd = _bunny_scene()
    plan = partition.build_plan(mesh, 6)
    _run_golden(GSDDStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd),
                3, GOLDEN_BUNNY_GSDD)


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="reference data absent")
def test_golden_bunny5k_lbfgsjh():
    from dot_tpu.steppers import LBFGSJH
    cfg, mesh, sd = _bunny_scene()
    plan = partition.build_node_plan(mesh, 6)
    _run_golden(LBFGSJH(System(mesh, cfg, plan, dtype=jnp.float64), sd),
                3, GOLDEN_BUNNY_LBFGSJH)


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="reference data absent")
def test_golden_bunny5k_admm_dd():
    from dot_tpu.steppers import ADMMDDStepper
    cfg, mesh, sd = _bunny_scene()
    plan = partition.build_plan(mesh, 6, own_plan=True)
    ap = partition.build_admm_dd_plan(mesh, plan)
    _run_golden(ADMMDDStepper(System(mesh, cfg, plan, dtype=jnp.float64),
                              sd, ap), 2, GOLDEN_BUNNY_ADMMDD)


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="reference data absent")
def test_golden_bunny5k_dot():
    """3 DOT6 frames on the real bunny5K mesh (f64): golden sysE trace —
    the production-shape regression net the tiny bar cannot provide
    (VERDICT r2: banded factors, interface completion, real partition)."""
    cfg = Config(energy="FCR", time_stepper="DOT", partition_amt=6,
                 dt=0.025, rho=1000.0, ym=1e5, pr=0.4, script="twistnsns",
                 handle_ratio=0.01)
    mesh = Mesh(*read_tet_mesh(BUNNY), ym=cfg.ym, pr=cfg.pr, rho=cfg.rho)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 6)
    stepper = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = stepper.init_state()
    vals = []
    for _ in range(len(GOLDEN_BUNNY_SYS_E)):
        st, (stats, sys_e) = stepper.step(st, rel_tol=1e-5)
        vals.append(float(sys_e))
    np.testing.assert_allclose(vals, GOLDEN_BUNNY_SYS_E, rtol=2e-4)
