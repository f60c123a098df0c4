"""Two-level H0 coarse space (System._coarse_factor / _coarse_apply).

No reference counterpart: the reference's DOT H0 (DOTTimeStepper.cpp:
618-797) is one-level — block solves over interface-completed subdomain
Hessians — so its iteration count grows with the subdomain count in
blockSize mode. dot_tpu adds a Galerkin coarse matrix over per-subdomain
rigid modes (Kc = Z^T (dt^2 K + M) Z) whose tiny dense solve restores the
global low-frequency modes. These tests pin the coarse matrix to a
brute-force Z^T H Z and check the apply + the iteration-count benefit.
"""

import numpy as np
import jax.numpy as jnp

from dot_tpu.config import Config
from dot_tpu.mesh_gen import bar_mesh
from dot_tpu import scripts, partition
from dot_tpu.steppers import System, DOTStepper


def _setup(nx=20, ny=4, nz=4, n_parts=4, coarse=1):
    mesh = bar_mesh(nx, ny, nz)
    cfg = Config(energy="FCR", dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="twist", handle_ratio=0.1, coarse=coarse)
    mesh.set_lame(cfg.ym, cfg.pr)
    mesh.find_border_verts(cfg.handle_ratio)
    sd = scripts.init_script(mesh, "twist")
    mesh.fixed_mask = sd.fixed0.copy()
    plan = partition.build_plan(mesh, n_parts, pad_elem_to=16,
                                pad_n3_to=48, band_bs_unit=48,
                                band_min_nb=3)
    sysm = System(mesh, cfg, plan, dtype=jnp.float64)
    return mesh, cfg, plan, sysm, sd


def _brute_coarse(mesh, plan, sysm, elem_h, fixed):
    """Z^T (dt^2 K + M) Z by dense numpy assembly."""
    nV = mesh.n_vert
    P = plan.n_parts
    free = ~np.asarray(fixed)
    # dense global Hessian from the block-major element buffer
    H = np.zeros((3 * nV, 3 * nV))
    eh = np.asarray(elem_h, np.float64)          # (144, nEp)
    conn = np.asarray(sysm._conn_scatter_np)     # (nEp, 4), pads -> nV
    for a in range(4):
        for b in range(4):
            for i in range(3):
                for j in range(3):
                    comp = (a * 4 + b) * 9 + i * 3 + j
                    va, vb = conn[:, a], conn[:, b]
                    ok = (va < nV) & (vb < nV)
                    np.add.at(H, (3 * va[ok] + i, 3 * vb[ok] + j),
                              eh[comp][ok])
    # free-dof masking on both sides + lumped mass on free diagonals
    F = np.repeat(free, 3).astype(np.float64)
    H = H * F[:, None] * F[None, :]
    H[np.arange(3 * nV), np.arange(3 * nV)] += np.repeat(
        np.asarray(mesh.mass) * free, 3)
    # rigid-mode basis with the same owner map / centering / scaling
    own = np.asarray(sysm.coarse_own)
    xc = np.asarray(sysm.coarse_xc, np.float64)
    Z = np.zeros((3 * nV, 6 * P))
    E = np.eye(3)
    for v in range(nV):
        if not free[v]:
            continue
        p = own[v]
        Z[3 * v:3 * v + 3, 6 * p:6 * p + 3] = E
        for k in range(3):
            Z[3 * v:3 * v + 3, 6 * p + 3 + k] = np.cross(E[k], xc[v])
    return Z.T @ H @ Z, Z


def test_coarse_matrix_matches_brute_force():
    mesh, cfg, plan, sysm, sd = _setup()
    assert sysm.use_coarse
    x = jnp.asarray(sd.x0, jnp.float64)
    fixed = jnp.asarray(sd.fixed0)
    _, U, s, V = sysm.fsvd(x)
    elem_h = sysm.element_hessians(U, s, V)
    Lc, dc = sysm._coarse_factor(elem_h, fixed)

    Kb, Z = _brute_coarse(mesh, plan, sysm, elem_h, sd.fixed0)
    # reconstruct Kc from the equilibrated factor (subtract the shift)
    Lc = np.asarray(Lc, np.float64)
    dc = np.asarray(dc, np.float64)
    Kn = Lc @ Lc.T - 1e-4 * np.eye(Lc.shape[0])
    Kc = Kn * dc[:, None] * dc[None, :]
    scale = np.abs(Kb).max()
    assert np.abs(Kc - Kb).max() < 1e-6 * scale


def test_coarse_apply_matches_brute_force():
    mesh, cfg, plan, sysm, sd = _setup()
    x = jnp.asarray(sd.x0, jnp.float64)
    fixed = jnp.asarray(sd.fixed0)
    _, U, s, V = sysm.fsvd(x)
    elem_h = sysm.element_hessians(U, s, V)
    kc = sysm._coarse_factor(elem_h, fixed)

    rng = np.random.default_rng(3)
    r = rng.normal(size=(mesh.n_vert, 3))
    r[sd.fixed0] = 0.0
    y = np.asarray(sysm._coarse_apply(kc, jnp.asarray(r, jnp.float64),
                                      fixed))
    # brute force through the same (shifted, equilibrated) solve
    Kb, Z = _brute_coarse(mesh, plan, sysm, elem_h, sd.fixed0)
    dc = np.asarray(kc[1], np.float64)
    Kn = Kb / dc[:, None] / dc[None, :] + 1e-4 * np.eye(Kb.shape[0])
    rc = (Z.T @ r.reshape(-1)) / dc
    yb = (Z @ (np.linalg.solve(Kn, rc) / dc)).reshape(-1, 3)
    assert np.abs(y - yb).max() < 1e-8 * max(np.abs(yb).max(), 1.0)


def test_coarse_reduces_iterations_at_high_part_count():
    """The point of the coarse space: at many parts, DOT with the coarse
    correction must converge in no more iterations than without (and in
    practice far fewer), to the same energies within tolerance."""
    iters = {}
    energies = {}
    for coarse in (0, 1):
        mesh, cfg, plan, sysm, sd = _setup(nx=36, ny=4, nz=4, n_parts=12,
                                           coarse=coarse)
        assert sysm.use_coarse == bool(coarse)
        stepper = DOTStepper(sysm, sd)
        st = stepper.init_state()
        tot, es = 0, []
        for _ in range(3):
            st, (stats, sys_e) = stepper.step(st)
            tot += int(stats.inner_iters)
            es.append(float(sys_e))
        iters[coarse] = tot
        energies[coarse] = es
    assert iters[1] <= iters[0], iters
    # same physics: converged energies agree to the stop tolerance scale
    for e0, e1 in zip(energies[0], energies[1]):
        assert abs(e0 - e1) / max(abs(e0), 1.0) < 5e-3, energies
