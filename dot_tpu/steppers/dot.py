"""The DOT time stepper: L-BFGS with a decomposed-subdomain implicit
initializer H0 = blkdiag(interface-completed subdomain Hessians),
factorized ONCE per time step (frozen during the step) by a batched dense
Cholesky, applied via batched triangular solves + duplicate averaging.

Reference: src/TimeStepper/DOTTimeStepper.cpp —
  fullyImplicit          :272-346 (history clear, warm start, iterate, refactor)
  solve_oneStep          :383-504 (two-loop around the subdomain backsolves)
  updateHessianAndFactor :348-380 (rebuild at converged x)
plus the DOT alpha-init stepSize = clamp(-g.p / p^T H_tr p, 0.1, 1)
(reference: Optimizer::initStepSize, Optimizer.cpp:1075-1093, ALPHAINIT).
"""

from __future__ import annotations

import jax.numpy as jnp

from .core import System
from .quasi_newton import QuasiNewtonStepper, line_search, _vdot  # noqa: F401


class DOTStepper(QuasiNewtonStepper):
    name = "DOT"

    def h0_apply(self, state, q):
        return self.system.h0_apply(state.chol, state.equil, q,
                                    kc=state.kc_chol, fixed=state.fixed)

    def end_of_step(self, sys, x, fixed, state):
        elem_h, L, d, kc = sys._rebuild_h0(x, fixed)
        return state._replace(elem_h=elem_h, chol=L, equil=d, kc_chol=kc)

    def alpha0_and_fp(self, sys, state, g, p):
        # one corner gather of p feeds both the quadratic form and the
        # line-search direction deformation gradients
        pe = sys.gather_corners(p)
        php = sys.quadratic_form(state.elem_h, p, pe=pe)
        gtp = _vdot(g, p)
        a0 = jnp.clip(-gtp / php, 0.1, 1.0).astype(sys.dtype)
        return a0, sys.defgrad_from_corners(pe)

