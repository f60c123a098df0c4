"""Multi-device sharding of the DOT step (conftest provisions 8 virtual
CPU devices). The subdomain axis is the framework's model-parallel
dimension; sharding it — together with the subdomain-contiguous element
axis of the System statics (dot_tpu.parallel) — must not change the
trajectory: the duplicate-vertex averaging (reference:
DOTTimeStepper.cpp:406-450) and the batched factor solves commute with
device placement. The statics ride through jit as pytree ARGUMENTS
(core.StaticPytree), which is what makes them shardable at all."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
import conftest
from dot_tpu import parallel
from dot_tpu.steppers.core import F64


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_unsharded():
    system, stepper = ge._build_scene(n_parts=8, dtype=jnp.float64)
    state = stepper.init_state()
    tol = jnp.asarray(system.target_g_res(1e-5), F64)
    step = jax.jit(type(stepper)._step_impl)

    ref_state, (ref_stats, ref_sys_e) = step(stepper, state, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    sh_state, (sh_stats, sh_sys_e) = step(st_sh, state_sh, tol)

    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(sh_sys_e), float(ref_sys_e),
                               rtol=1e-12)
    assert int(sh_stats.inner_iters) == int(ref_stats.inner_iters)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_banded_step_matches_unsharded_and_partitions():
    """Same invariance through the RCM-banded (BTDFactor) storage — the
    production path for real scenes — plus the distribution proof: the
    compiled per-device program must operate on 1/8 of the element axis
    (the reference's analog is TBB element parallelism,
    Energy.cpp:309-324)."""
    from dot_tpu.steppers.core import BTDFactor

    system, stepper = ge._build_scene(n_parts=8, nx=48, band_bs_unit=48,
                                      band_min_nb=3)
    state = stepper.init_state()
    assert isinstance(state.chol, BTDFactor)
    tol = jnp.asarray(system.target_g_res(1e-5), F64)
    step = jax.jit(type(stepper)._step_impl)

    ref_state, _ = step(stepper, state, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    compiled = step.lower(st_sh, state_sh, tol).compile()
    sh_state, _ = compiled(st_sh, state_sh, tol)
    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x), rtol=0, atol=1e-5)

    # element-axis distribution: per-device HLO shapes carry nEp/8
    n_ep = system.n_elem_p
    hlo = compiled.as_text()
    assert hlo.count(f"f32[{n_ep // 8}]") > 30, \
        "element chain did not partition across the device mesh"
    assert hlo.count(f"f32[{n_ep}]") == 0, \
        "full-size element arrays remain in the per-device program"

    # and the cross-device coupling is visible + accounted: the
    # replicated-vertex gradient reduction must appear as all-reduce
    traffic = parallel.collective_traffic(compiled)
    assert traffic.get("all-reduce", {}).get("count", 0) > 0
    assert traffic["total"]["bytes"] > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_gsdd_matches_unsharded():
    """GSDD under sharding: the element chain (gradient + line-search
    trials, the per-sweep cost) partitions; the factor stack stays
    replicated because the Gauss-Seidel sweep visits subdomains one at a
    time (reference: solve_oneStep_GSDD, DOTTimeStepper.cpp:506-565)."""
    system, stepper = ge._build_scene(n_parts=8, nx=16, dtype=jnp.float64,
                                      stepper="GSDD", band_bs_unit=48,
                                      band_min_nb=3)
    state = stepper.init_state()
    tol = jnp.asarray(system.target_g_res(1e-5), F64)
    step = jax.jit(type(stepper)._step_impl)
    ref_state, (ref_stats, _) = step(stepper, state, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    sh_state, (sh_stats, _) = step(st_sh, state_sh, tol)
    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x), rtol=0, atol=1e-10)
    assert int(sh_stats.inner_iters) == int(ref_stats.inner_iters)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_admm_dd_matches_unsharded():
    """ADMM-DD under sharding: local element chain + element-Hessian
    slab shard on the element axis; the consensus factor replicates
    (it IS the global coupling, ADMMDDTimeStepper.cpp:1254-1344). One
    prelude + one chunk must reproduce the unsharded primal/consensus
    iterates exactly in f64."""
    system, stepper = ge._build_scene(n_parts=8, nx=16, dtype=jnp.float64,
                                      stepper="ADMMDD", band_bs_unit=48,
                                      band_min_nb=3)
    state = stepper.init_state()
    tol = jnp.asarray(system.target_g_res(1e-5), F64)
    prelude = jax.jit(type(stepper)._prelude_impl)
    chunk = jax.jit(type(stepper)._chunk_impl)
    env, carry = prelude(stepper, state, tol)
    carry = chunk(stepper, env, carry, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    env_s, carry_s = prelude(st_sh, state_sh, tol)
    carry_s = chunk(st_sh, env_s, carry_s, tol)
    np.testing.assert_allclose(np.asarray(carry_s[1]),     # consensus z
                               np.asarray(carry[1]), rtol=0, atol=1e-10)
    assert int(carry_s[7]) == int(carry[7])                # ADMM iters


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_unsharded_on_real_mesh():
    """Sharded==unsharded on a REAL irregular mesh (bunny5K.msh, 19K
    tets) with the production partitioner (mlkway k-way dual-graph, the
    METIS_PartMeshDual role) — every other invariance proof here runs on
    structured bars with RCB slabs; this one exercises irregular local
    sizes, real interface completion, and an uneven dup field under
    device placement."""
    import os
    from refpaths import ref_path
    from dot_tpu.config import Config
    from dot_tpu.mesh import Mesh
    from dot_tpu.io import read_tet_mesh
    from dot_tpu import partition, scripts
    from dot_tpu.steppers import System, DOTStepper

    bunny = ref_path("input", "tetMeshes", "bunny5K.msh")
    if not os.path.exists(bunny):
        pytest.skip("reference data absent")
    cfg = Config(energy="FCR", time_stepper="DOT", partition_amt=8,
                 dt=0.025, rho=1000.0, ym=1e5, pr=0.4, script="twistnsns",
                 handle_ratio=0.01)
    msh = Mesh(*read_tet_mesh(bunny), ym=cfg.ym, pr=cfg.pr, rho=cfg.rho)
    msh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(msh, cfg.script)
    msh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(msh, 8)
    stepper = DOTStepper(System(msh, cfg, plan, dtype=jnp.float64), sd)
    state = stepper.init_state()
    tol = jnp.asarray(stepper.system.target_g_res(1e-5), F64)
    step = jax.jit(type(stepper)._step_impl)

    ref_state, (ref_stats, ref_sys_e) = step(stepper, state, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    sh_state, (sh_stats, sh_sys_e) = step(st_sh, state_sh, tol)

    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(float(sh_sys_e), float(ref_sys_e),
                               rtol=1e-10)
    assert int(sh_stats.inner_iters) == int(ref_stats.inner_iters)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@conftest.subprocess_isolated
def test_sharded_step_with_coarse_space_matches_unsharded():
    """The two-level H0 must commute with device placement: the coarse
    restriction/prolongation are vertex segment-sums over the replicated
    global fields and the (6P)^2 factor is replicated (parallel.py), so
    the sharded trajectory must be bit-comparable to the single-device
    one, exactly like the one-level path."""
    system, stepper = ge._build_scene(n_parts=8, nx=32, dtype=jnp.float64,
                                      coarse=1)
    assert system.use_coarse
    state = stepper.init_state()
    assert state.kc_chol is not None
    tol = jnp.asarray(system.target_g_res(1e-5), F64)
    step = jax.jit(type(stepper)._step_impl)

    ref_state, (ref_stats, ref_sys_e) = step(stepper, state, tol)

    mesh = parallel.device_mesh(8)
    st_sh, state_sh = parallel.shard_for_step(stepper, state, mesh)
    sh_state, (sh_stats, sh_sys_e) = step(st_sh, state_sh, tol)

    np.testing.assert_allclose(np.asarray(sh_state.x),
                               np.asarray(ref_state.x),
                               rtol=0, atol=1e-12)
    assert int(sh_stats.inner_iters) == int(ref_stats.inner_iters)
