"""warmStart options, incl. the Jacobi-preconditioned init (option 5,
reference: Optimizer::initX, Optimizer.cpp:441-582)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.config import Config
from dot_tpu import partition, scripts
from dot_tpu.steppers import System, DOTStepper


def _system(warm):
    mesh = bar_mesh(6, 2, 2)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 2, pad_elem_to=16, pad_n3_to=48)
    system = System(mesh, cfg, plan, dtype=jnp.float64)
    return system, DOTStepper(system, sd, warm_start_opt=warm)


def test_hessian_diag_matches_dense():
    """hessian_diag (warmStart 5's Jacobi diagonal) must equal the diagonal
    of the assembled dense P=1 system."""
    mesh = bar_mesh(4, 2, 2)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 1, pad_elem_to=16, pad_n3_to=48)
    sys_ = System(mesh, cfg, plan, dtype=jnp.float64)

    x = jnp.asarray(sd.x0, jnp.float64)
    fixed = jnp.zeros(mesh.n_vert, bool)  # no fixed rows: pure H diag
    _, U, s, V = sys_.fsvd(x)
    elem_h = sys_.element_hessians(U, s, V)
    diag = np.asarray(sys_.hessian_diag(elem_h))

    Hd = np.asarray(sys_.assemble_subdomains(elem_h, fixed))[0]
    l2g = np.asarray(sys_.l2g[0])
    valid = np.asarray(sys_.local_valid[0])
    dense_diag = np.zeros((mesh.n_vert, 3))
    for li in range(len(l2g)):
        if valid[li]:
            for i in range(3):
                dense_diag[l2g[li], i] = Hd[3 * li + i, 3 * li + i]
    np.testing.assert_allclose(diag, dense_diag, rtol=1e-10)


@pytest.mark.parametrize("warm", [0, 1, 3, 4, 5])
def test_warmstart_options_step(warm):
    """Every warm-start option yields a working, converging step."""
    system, stepper = _system(warm)
    st = stepper.init_state()
    for _ in range(2):
        st, (stats, sys_e) = stepper.step(st, 1e-5)
    assert np.isfinite(np.asarray(st.x)).all()
    assert np.isfinite(float(sys_e))
    assert int(stats.inner_iters) >= 1
