"""Adaptive H0 refresh (config `h0Refresh -1`, a dot_tpu extension —
the reference refactorizes every step, DOTTimeStepper.cpp:343) at its
two risk points (VERDICT r4 weak #7):

1. a velocity TURNING POINT (twistnsns sign flip,
   AnimScripter.cpp:179-217): the regime hardens while the lagged
   regression signal trails up to `pipeline` frames behind — iteration
   counts must stay within a band of the fresh-per-frame policy and the
   physics must agree;
2. a mid-run DIRICHLET CHANGE (rubberBandPull release,
   AnimScripter.cpp:219-258): the BC-change hook must force an in-step
   refactorization even when the end-of-step rebuild is frozen.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dot_tpu import io as meshio
from dot_tpu import scripts
from dot_tpu.config import Config
from dot_tpu.mesh_gen import bar_mesh


def _write_bar_scene(tmp_path, script, stepper="DOT 4", dt=0.025,
                     dur=0.5):
    m = bar_mesh(10, 4, 4, size=(4.0, 1.0, 1.0))
    mesh_path = os.path.join(tmp_path, "bar.msh")
    meshio.save_tet_mesh(mesh_path, m.V, m.conn, m.SF)
    scene = os.path.join(tmp_path, "scene.txt")
    with open(scene, "w") as f:
        f.write(f"""energy FCR
timeStepper {stepper}
warmStart 2
size 1
time {dur} {dt}
density 1000
stiffness 100000 0.4
script {script}
handleRatio 0.1
shape input {mesh_path}
""")
    return scene


def test_adaptive_refresh_band_through_turning_point(tmp_path, monkeypatch):
    """h0Refresh -1 driven through a twistnsns turning point via the
    REAL Simulator policy (lagged trigger, re-baselining, 32-frame cap;
    sim.py). The turning bound is tightened so the flip lands at ~frame
    8 of a 16-frame run — inside the adaptive epoch, with the stats
    pipeline lag in play. Pass = the sign flipped in both runs, the
    frozen-factor run converges within a band of the fresh run, and the
    final system energies agree."""
    from dot_tpu.sim import Simulator

    orig = scripts.init_script

    def tight_turning(mesh, kind):
        sd = orig(mesh, kind)
        x0 = sd.x0[sd.turning_vert, 0]
        # default lo is 1.2 away (40 frames at 1.2 m/s, dt 0.025);
        # pull it to ~8 frames so the flip happens mid-run
        return dataclasses.replace(
            sd, turning_lo=float(x0 - 8 * 0.025 * 1.2 + 1e-6))

    monkeypatch.setattr(scripts, "init_script", tight_turning)
    scene = _write_bar_scene(tmp_path, "twistnsns", dur=0.4)

    def run(policy, tag):
        cfg = Config.load(scene)
        cfg.h0_refresh = policy
        sim = Simulator(cfg, os.path.join(tmp_path, "out_" + tag),
                        dtype=jnp.float64, save_every=10 ** 9, mute=True,
                        render=False)
        sim.run(16)
        return sim

    sim_fresh = run(1, "fresh")
    sim_adapt = run(-1, "adapt")

    # the turning point fired in both runs
    assert float(jax.device_get(sim_fresh.state.vel_sign)) < 0
    assert float(jax.device_get(sim_adapt.state.vel_sign)) < 0

    it_f = sim_fresh.inner_iter_total
    it_a = sim_adapt.inner_iter_total
    assert it_f > 0
    # stale factors may only cost iterations — bounded ones
    assert it_a <= it_f * 1.8 + 16, (it_a, it_f)

    xf = np.asarray(jax.device_get(sim_fresh.state.x))
    xa = np.asarray(jax.device_get(sim_adapt.state.x))
    scale = np.abs(xf).max()
    # same physics at the same tolerance (trajectories may differ within
    # line-search nondeterminism, BASELINE.md)
    assert np.abs(xf - xa).max() < 5e-3 * scale


def test_bc_change_forces_refresh_with_frozen_h0(tmp_path):
    """rubberBandPull's waist release changes the Dirichlet set mid-run;
    the traced BC-change hook (quasi_newton._step_impl ->
    on_bc_change -> _rebuild_h0) must refactorize IN-STEP even when the
    end-of-step rebuild is disabled (refresh=False), exactly like the
    reference's updatePrecondMtrAndFactorize
    (DOTTimeStepper.cpp:184-270)."""
    from dot_tpu.mesh import Mesh
    from dot_tpu.io import read_tet_mesh
    from dot_tpu import partition
    from dot_tpu.steppers import System, DOTStepper

    scene = _write_bar_scene(tmp_path, "rubberBandPull")
    cfg = Config.load(scene)
    mesh = Mesh(*read_tet_mesh(cfg.input_shape_path), ym=cfg.ym,
                pr=cfg.pr, rho=cfg.rho)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    # pull the release bound to ~frame 3 (default is 5.0/2.5 = 2 s away)
    x0 = sd.x0[sd.turning_vert, 0]
    sd = dataclasses.replace(
        sd, turning_lo=float(x0 - 3 * 0.025 * 2.5 + 1e-6))
    assert sd.has_bc_change
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 4)
    stepper = DOTStepper(System(mesh, cfg, plan, dtype=jnp.float64), sd)
    st = stepper.init_state()

    def factor_sig(state):
        return np.array([float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
                         for leaf in jax.tree.leaves(state.chol)])

    sig = factor_sig(st)
    released_at = None
    changed_at = []
    for frame in range(6):
        st, _ = stepper.step(st, 1e-5, refresh=False)  # end-of-step frozen
        new_sig = factor_sig(st)
        if np.abs(new_sig - sig).max() > 0:
            changed_at.append(frame)
        sig = new_sig
        if released_at is None and bool(jax.device_get(st.released)):
            released_at = frame
    assert released_at is not None, "release never fired"
    # the ONLY factor change is the in-step BC-change refactorization
    assert changed_at == [released_at], (changed_at, released_at)
