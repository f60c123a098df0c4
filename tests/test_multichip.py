"""Multi-device sharding of the DOT step (conftest provisions 8 virtual
CPU devices). The subdomain axis is the framework's model-parallel
dimension; sharding it must not change the trajectory: the duplicate-
vertex averaging (reference: DOTTimeStepper.cpp:406-450) and the batched
factor solves commute with device placement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
from dot_tpu.steppers.core import F64, SimState


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_unsharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    system, stepper = ge._build_scene(n_parts=8, dtype=jnp.float64)
    state = stepper.init_state()
    tol = jnp.asarray(system.target_g_res(1e-5), F64)

    step = jax.jit(stepper._build_step())
    ref_state, (ref_stats, ref_sys_e) = step(state, tol)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sbd",))
    rep = NamedSharding(mesh, P())
    shardings = SimState(
        x=rep, x_n=rep, v=rep, x_tilta=rep, dx_elastic=rep, fixed=rep,
        vel_sign=rep, released=rep,
        elem_h=NamedSharding(mesh, P(None, "sbd")),
        chol=NamedSharding(mesh, P("sbd", None, None)),
        equil=NamedSharding(mesh, P("sbd", None)),
        lb_s=rep, lb_t=rep, lb_rho=rep, lb_valid=rep,
    )
    sharded_step = jax.jit(stepper._build_step(),
                           in_shardings=(shardings, rep))
    state_sh = jax.device_put(state, shardings)
    sh_state, (sh_stats, sh_sys_e) = sharded_step(state_sh, tol)

    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(sh_sys_e), float(ref_sys_e),
                               rtol=1e-12)
    assert int(sh_stats.inner_iters) == int(ref_stats.inner_iters)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_banded_step_matches_unsharded():
    """Same invariance through the RCM-banded (BTDFactor) storage — the
    production path for real scenes."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from dot_tpu.steppers.core import BTDFactor

    system, stepper = ge._build_scene(n_parts=8, nx=48, band_bs_unit=48,
                                      band_min_nb=3)
    state = stepper.init_state()
    assert isinstance(state.chol, BTDFactor)
    tol = jnp.asarray(system.target_g_res(1e-5), F64)

    step = jax.jit(stepper._build_step())
    ref_state, _ = step(state, tol)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sbd",))
    rep = NamedSharding(mesh, P())
    sbd = lambda leaf: NamedSharding(mesh, P(None, "sbd"))  # scan-major
    shardings = SimState(
        x=rep, x_n=rep, v=rep, x_tilta=rep, dx_elastic=rep, fixed=rep,
        vel_sign=rep, released=rep,
        elem_h=NamedSharding(mesh, P(None, "sbd")),
        chol=jax.tree.map(sbd, state.chol),
        equil=NamedSharding(mesh, P("sbd", None)),
        lb_s=rep, lb_t=rep, lb_rho=rep, lb_valid=rep,
    )
    sharded_step = jax.jit(stepper._build_step(),
                           in_shardings=(shardings, rep))
    sh_state, _ = sharded_step(jax.device_put(state, shardings), tol)
    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x), rtol=0, atol=1e-5)
