"""GSDD time stepper: sequential Gauss-Seidel over the DOT subdomains —
per sweep, each subdomain solves its frozen interface-completed Hessian
against the current (negative) gradient, takes a globally line-searched
step, and the gradient is refreshed before the next subdomain.

Reference: DOTTimeStepper::solve_oneStep_GSDD (DOTTimeStepper.cpp:506-565).
Notes kept faithful:
- no L-BFGS history is used on this path (the buffers exist but the sweep
  is plain block GS);
- line search starts at alpha = 1 (ALPHAINIT is gated on TST_DOT);
- `stopped || lineSearch(...)` short-circuits: once a line search stops,
  later subdomains in the sweep no longer move;
- subdomain Hessians are rebuilt + refactorized once per time step, after
  convergence (updateHessianAndFactor), exactly like DOT.

The reference refreshes only the next subdomain's local gradient
(computeGradient_extract); here the full batched gradient is one fused
kernel, so we refresh it globally — same values, strictly fresher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import (SimState, StepStats, F64, INNER_ITER_CAP, REL_EDEC_STOP,
                   STATS_CAP)
from .quasi_newton import QuasiNewtonStepper, line_search, _vdot


class GSDDStepper(QuasiNewtonStepper):
    name = "GSDD"

    def _subdomain_solve(self, sys, state, q, i):
        """Solve subdomain i's factor against the global vector q; scatter
        the local solution into a zero global direction. `i` may be a
        traced index (the sweep runs as a lax.fori_loop over subdomains,
        so program size does not grow with the partition count)."""
        from .core import BTDFactor, CRFactor
        if isinstance(state.chol, (BTDFactor, CRFactor)):
            # scan-major / CR factor: subdomain axis is axis 1 on every leaf
            L = jax.tree.map(
                lambda leaf: jax.lax.dynamic_slice_in_dim(leaf, i, 1, axis=1),
                state.chol)
        else:
            L = jax.lax.dynamic_slice_in_dim(state.chol, i, 1, axis=0)
        d = jnp.take(state.equil, i, axis=0)
        l2g_i = jnp.take(sys.l2g, i, axis=0)
        valid_i = jnp.take(sys.local_valid, i, axis=0)
        # gather/scatter go through dimension hooks (3 dofs/vertex at
        # dim 3, 2 at dim 2) so the same sweep drives both pipelines
        r = (sys.local_gather_one(q, l2g_i, valid_i) / d)[None]
        z = sys.solve_local(L, r)
        return sys.local_scatter_one(z[0].astype(sys.dtype) / d,
                                     l2g_i, valid_i)

    def end_of_step(self, sys, x, fixed, state):
        elem_h, L, d, kc = sys._rebuild_h0(x, fixed)
        return state._replace(elem_h=elem_h, chol=L, equil=d, kc_chol=kc)

    # full custom inner loop: one while iteration == one GS sweep
    def _step_impl(self, state: SimState, tol, refresh=True):
        sys = self.system
        sd = self.script_data
        anim = self._anim
        n_parts = sys.n_parts

        x, fixed, vel_sign, released, bc_changed = anim(
            state.x, state.fixed, state.vel_sign, state.released)
        state = state._replace(fixed=fixed, vel_sign=vel_sign,
                               released=released)
        if sd.has_bc_change:
            state = jax.lax.cond(
                bc_changed,
                lambda st: self.on_bc_change(sys, x, fixed, st),
                lambda st: st, state)

        x = sys.warm_start(self.warm_start_opt, x, state.v,
                           state.dx_elastic, fixed,
                           x_tilta=state.x_tilta)
        F, U, s, V = sys.fsvd(x)
        e = sys.energy(x, state.x_tilta, s)
        g = sys.gradient(x, state.x_tilta, fixed, F, U, s, V)
        sqn_g = _vdot(g, g)

        rows = jnp.zeros((STATS_CAP, 3), F64)
        rows = rows.at[0].set(jnp.stack([jnp.zeros((), F64),
                                         e.astype(F64), sqn_g.astype(F64)]))

        def cond(c):
            (x, e, g, Fc, sqn_g, it, stopped, n_ls, rows) = c
            return jnp.logical_and(
                sqn_g > tol,
                jnp.logical_and(it < INNER_ITER_CAP,
                                jnp.logical_not(stopped)))

        def body(c):
            (x, e, g, Fc, sqn_g, it, stopped, n_ls, rows) = c
            # The 1e-3 relative-decrease stop is evaluated per SWEEP
            # (the reference checks it in fullyImplicit after each
            # solve_oneStep_GSDD call, Optimizer.cpp:856-862), NOT per
            # subdomain: a single stalling subdomain must not abort
            # the whole inner loop (observed divergence on monkey18K).
            e_sweep0 = e

            # sequential GS sweep as a fori_loop over the subdomain index
            # (factors are stacked; the per-subdomain solve uses dynamic
            # slicing) — program size stays O(1) in the partition count,
            # so `GSDD -1 1024`-class configs compile.
            def sweep(i, carry):
                x, e, g, Fc, n_ls, all_failed = carry
                p = self._subdomain_solve(sys, state, -g, i)
                x_new, e_new, svd, alpha, halv, failed = line_search(
                    sys, x, p, e, state.x_tilta,
                    jnp.asarray(1.0, sys.dtype), F0=Fc)
                take = jnp.logical_not(failed)
                Fn, Un, sn, Vn = svd
                g_new = sys.gradient(jnp.where(take, x_new, x),
                                     state.x_tilta, fixed,
                                     Fn, Un, sn, Vn)
                x = jnp.where(take, x_new, x)
                e = jnp.where(take, e_new, e)
                g = jnp.where(take, g_new, g)
                Fc = jax.tree.map(
                    lambda a, b: jnp.where(take, b, a), Fc, Fn)
                n_ls = n_ls + jnp.where(take, halv, 0)
                return (x, e, g, Fc, n_ls,
                        jnp.logical_and(all_failed, failed))

            (x, e, g, Fc, n_ls, all_failed) = jax.lax.fori_loop(
                0, n_parts, sweep,
                (x, e, g, Fc, n_ls, jnp.asarray(True)))

            # sweep-level stop: every local line search failed, or the
            # sweep's total energy decrease fell under the 1e-3 rule
            stopped = jnp.logical_or(
                all_failed,
                (e_sweep0 - e) / e_sweep0 < REL_EDEC_STOP)
            sqn_g = _vdot(g, g)
            it = it + 1
            row = jnp.stack([jnp.ones((), F64), e.astype(F64),
                             sqn_g.astype(F64)])
            rows = rows.at[jnp.minimum(it, STATS_CAP - 1)].set(row)
            return (x, e, g, Fc, sqn_g, it, stopped, n_ls, rows)

        init = (x, e, g, F, sqn_g, jnp.asarray(0, jnp.int32),
                jnp.asarray(False), jnp.asarray(0, jnp.int32), rows)
        (x, e, g, _F, sqn_g, it, stopped, n_ls, rows) = \
            jax.lax.while_loop(cond, body, init)

        state = jax.lax.cond(
            refresh,
            lambda st: self.end_of_step(sys, x, fixed, st),
            lambda st: st, state)
        x_n_prev = state.x_n
        state = sys.be_update(state, x)

        _, _, s_fin, _ = sys.fsvd(x)
        sys_e = sys.system_energy(x, x_n_prev, s_fin)
        stats = StepStats(energy=e, sqn_g=sqn_g, inner_iters=it,
                          ls_halvings=n_ls, stopped=stopped, rows=rows)
        return state, (stats, sys_e)
