"""RCM ordering + block-tridiagonal factorization correctness.

The banded path must be EXACT (RCM keeps every coupling inside the band;
Cholesky fill stays in-band), so banded and dense systems must agree to
floating-point roundoff on the same mesh — both for the raw H0 apply and
for whole trajectories (reference role: CHOLMODSolver.cpp:136-163).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dot_tpu import ordering, partition, scripts
from dot_tpu.config import Config
from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.steppers import System, DOTStepper, NewtonStepper, GSDDStepper
from dot_tpu.steppers.core import BTDFactor


def _scene(n_parts, banded, band_bs_unit=48, stepper="DOT"):
    mesh = bar_mesh(8, 3, 3)
    cfg = Config(energy="FCR", time_stepper=stepper, partition_amt=n_parts,
                 dt=0.025, rho=1000.0, ym=1e5, pr=0.4, script="stretch",
                 handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, cfg.script)
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, n_parts, pad_elem_to=16, pad_n3_to=48,
                                banded=banded, band_bs_unit=band_bs_unit,
                                band_min_nb=3)
    system = System(mesh, cfg, plan, dtype=jnp.float64)
    return mesh, cfg, sd, plan, system


def test_rcm_order_is_valid_permutation_and_reduces_bandwidth():
    rng = np.random.default_rng(0)
    n = 200
    # ring + random chords: natural ordering of a ring is already banded,
    # so shuffle labels first
    relab = rng.permutation(n).astype(np.int32)
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    chords = rng.integers(0, n, (2, 60))
    rows = relab[np.concatenate([ring[0], chords[0]])]
    cols = relab[np.concatenate([ring[1], chords[1]])]
    perm = ordering.rcm_order(n, rows, cols)
    assert sorted(perm.tolist()) == list(range(n))
    bw0 = ordering.graph_bandwidth(np.arange(n, dtype=np.int32), rows, cols)
    bw = ordering.graph_bandwidth(perm, rows, cols)
    assert bw < bw0


def test_rcm_handles_disconnected_graphs():
    # two triangles + an isolated vertex
    rows = np.asarray([0, 1, 2, 4, 5, 6], np.int32)
    cols = np.asarray([1, 2, 0, 5, 6, 4], np.int32)
    perm = ordering.rcm_order(8, rows, cols)
    assert sorted(perm.tolist()) == list(range(8))


def test_banded_plan_band_covers_all_entries():
    _, _, _, plan, _ = _scene(2, banded=True)
    assert plan.band_nb >= 3
    # destinations land in [diag | sub] or exactly at the dump slot
    # (upper block-neighbor entries — their transpose lives in sub);
    # dropped and kept entries must balance: #dump == #sub-block scalars
    total = (plan.n_parts * plan.band_nb * plan.band_bs ** 2
             + plan.n_parts * (plan.band_nb - 1) * plan.band_bs ** 2)
    dest = plan.band_dest
    assert int(dest.max()) <= total
    diag_sz = plan.n_parts * plan.band_nb * plan.band_bs ** 2
    n_sub = int(((dest >= diag_sz) & (dest < total)).sum())
    n_dump = int((dest == total).sum())
    assert n_sub == n_dump and n_sub > 0


def test_btd_h0_apply_matches_dense():
    mesh_d, cfg, sd, plan_d, sys_d = _scene(2, banded=False)
    mesh_b, _, _, plan_b, sys_b = _scene(2, banded=True)
    assert sys_b.banded and not sys_d.banded
    x = jnp.asarray(sd.x0, jnp.float64)
    fixed = jnp.asarray(sd.fixed0)
    _, Ld, dd, _kc = sys_d.rebuild_h0(x, fixed)
    _, Lb, db, _kc = sys_b.rebuild_h0(x, fixed)
    assert isinstance(Lb, BTDFactor)
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.normal(size=(mesh_d.n_vert, 3)))
    pd = sys_d.h0_apply(Ld, dd, rhs)
    pb = sys_b.h0_apply(Lb, db, rhs)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pd),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("stepper_cls,n_parts", [(DOTStepper, 2),
                                                 (NewtonStepper, 1),
                                                 (GSDDStepper, 2)])
def test_banded_trajectory_matches_dense(stepper_cls, n_parts):
    states = []
    for banded in (False, True):
        _, cfg, sd, _, system = _scene(n_parts, banded=banded,
                                       stepper="DOT" if n_parts > 1
                                       else "Newton")
        st = stepper_cls(system, sd)
        state = st.init_state()
        for _ in range(3):
            state, _ = st.step(state, rel_tol=1e-5)
        states.append(np.asarray(state.x))
    np.testing.assert_allclose(states[1], states[0], rtol=1e-7, atol=1e-10)


def test_banded_pd_factor_matches_dense():
    """Whole-mesh scalar RCM-banded PD factor (LBFGS-PD/ADMM-PD global
    matrix) must agree with the dense build to roundoff — it removes the
    dense (nV, nV) ceiling for the PD-family steppers."""
    mesh, cfg, sd, _, system = _scene(1, banded=False)
    sys_b = System(mesh, cfg, None, dtype=jnp.float64)
    sys_b._pd_band_plan = partition.build_pd_band_plan(
        sys_b._conn_scatter_np, mesh.n_vert, bs_unit=16)
    assert sys_b.pd_band_plan is not None
    sys_d = System(mesh, cfg, None, dtype=jnp.float64)
    sys_d._pd_band_plan = None
    fixed = jnp.asarray(sd.fixed0)
    Lb, db = sys_b._build_pd_factor(fixed)
    assert isinstance(Lb, BTDFactor)
    Ld, dd = sys_d._build_pd_factor(fixed)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.normal(size=(mesh.n_vert, 3)))
    np.testing.assert_allclose(np.asarray(sys_b.pd_solve(Lb, db, rhs)),
                               np.asarray(sys_d.pd_solve(Ld, dd, rhs)),
                               rtol=1e-10, atol=1e-13)


def test_cyclic_reduction_matches_scan_factor():
    """factorize_fast takes the block-cyclic-reduction path on deep bands
    (nb >= 8); its solves must match the sequential scan factorization
    (both are exact Cholesky-class factorizations of the same SPD
    block-tridiagonal system, CR under the odd-even permutation)."""
    from dot_tpu.steppers.core import CRFactor

    mesh = bar_mesh(40, 3, 3)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "stretch")
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 2, pad_elem_to=16, pad_n3_to=48,
                                band_bs_unit=48, band_min_nb=3)
    assert plan.band_nb >= 9
    rng = np.random.default_rng(0)
    for dtype, tol in ((jnp.float64, 1e-10), (jnp.float32, 5e-2)):
        sysm = System(mesh, cfg, plan, dtype=dtype)
        x = jnp.asarray(sd.x0, dtype)
        fixed = jnp.asarray(sd.fixed0)
        _, U, s, V = sysm.fsvd(x)
        eh = sysm.element_hessians(U, s, V)
        Hd = sysm.assemble_subdomains(eh, fixed)
        Lex, dex = sysm.factorize(Hd)          # scan, exact
        Lcr, dcr = sysm.factorize_fast(Hd)     # CR (f32: bf16 GEMMs)
        assert isinstance(Lcr, CRFactor) and len(Lcr.levels) >= 2
        r = jnp.asarray(rng.normal(size=(plan.n_parts, plan.n3)), dtype)
        z1 = sysm.solve_local(Lex, r.astype(sysm._solve_dtype))
        z2 = sysm.solve_local(Lcr, r.astype(sysm._solve_dtype))
        err = float(jnp.abs(z1 - z2).max() / jnp.abs(z1).max())
        assert err < tol, (dtype, err)


def test_chunked_rebuild_matches_full():
    """The blockSize-scale low-memory H0 rebuild (lower-triangle scan
    assembly + pre-equilibrated bf16 band + single batched scan
    factorization, System._rebuild_banded_chunked) must produce the same
    factors/solves as the one-shot f32 path to preconditioner-grade
    (bf16) accuracy."""
    mesh = bar_mesh(24, 4, 4)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="twist", handle_ratio=0.1)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "twist")
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, 5, pad_elem_to=16, pad_n3_to=48,
                                band_bs_unit=48, band_min_nb=3)
    x = jnp.asarray(sd.x0, jnp.float32)
    fixed = jnp.asarray(sd.fixed0)

    sys_full = System(mesh, cfg, plan, dtype=jnp.float32)
    assert getattr(sys_full, "_chunk", None) is None  # small band: one shot
    _, Lf, df, _kc = sys_full._rebuild_h0(x, fixed)

    # force the low-memory path on this small mesh
    sys_c = System(mesh, cfg, plan, dtype=jnp.float32)
    sys_c._chunk = True
    # the blockSize-scale subdomain-scan assembly must reproduce the flat
    # gather+segment_sum compact exactly on the lower-triangle blocks the
    # factorization reads (strict-upper vertex blocks are skipped: the
    # whole banded factor chain is lower-triangular-only)
    sys_c._build_scan_assembly(plan)
    _, U, s, V = sys_c.fsvd(x)
    eh = sys_c.element_hessians(U, s, V)
    N = plan.n3 // 3
    low = (np.asarray(plan.band_ub_row) % N
           >= np.asarray(plan.band_ub_col) % N)
    np.testing.assert_allclose(
        np.asarray(sys_c._assembly_compact(eh))[low],
        np.asarray(sys_full._assembly_compact(eh))[low],
        rtol=1e-6, atol=1e-7)
    _, Lc, dc, _kc = sys_c._rebuild_h0(x, fixed)

    np.testing.assert_allclose(np.asarray(dc), np.asarray(df),
                               rtol=1e-6, atol=1e-8)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=(plan.n_parts, plan.n3)), jnp.float32)
    zf = sys_full.solve_local(Lf, r)
    zc = sys_c.solve_local(Lc, r)
    err = float(jnp.abs(zf - zc).max() / jnp.abs(zf).max())
    assert err < 5e-2, err  # both bf16-stored preconditioner factors

    # and in f64/None-apply mode the chunk plan must not engage at all
    sys64 = System(mesh, cfg, plan, dtype=jnp.float64)
    assert getattr(sys64, "_chunk", None) is None
