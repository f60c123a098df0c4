"""Per-activity timing attribution (reference: the 14-activity
`timer_step` dump in main.cpp:864-888, printed to info.txt:338-358).

The reference interleaves host timers with solver stages. Here the whole
inner solve is one jitted XLA program, so stages cannot be timed in situ;
instead each stage's jitted sub-program is re-run on the final simulation
state and timed in isolation. The numbers are representative per-CALL
device times (the jitted step fuses stages, so the in-step cost is a
lower bound of the sum), but they are reproducible and use the same
activity vocabulary as the reference's info.txt.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion: on remote-tunneled backends block_until_ready
    can return before execution finishes, so download one scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    import numpy as _np
    _np.asarray(jnp.ravel(leaf)[0])


def _time_call(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def profile_step_components(stepper, state, reps=3):
    """Times the solver-stage sub-programs on `state` and returns
    {reference-activity-name: seconds-per-call}. Works for any stepper
    built on the shared System; stages a stepper doesn't use are omitted."""
    sys = stepper.system
    x, x_tilta, fixed = state.x, state.x_tilta, state.fixed
    acts = {}

    fsvd = jax.jit(sys.fsvd)
    F, U, s, V = fsvd(x)
    acts["lineSearch_eVal"] = _time_call(
        jax.jit(lambda x: sys.energy(x, x_tilta, sys.fsvd(x)[2])), x,
        reps=reps)
    acts["compGrad"] = _time_call(
        jax.jit(lambda x: sys.gradient(x, x_tilta, fixed, *sys.fsvd(x))),
        x, reps=reps)

    if getattr(sys, "plan", None) is not None:
        eh = jax.jit(sys.element_hessians)
        elem_h = eh(U, s, V)
        acts["matrixComputation"] = _time_call(eh, U, s, V, reps=reps)
        asm = jax.jit(lambda h: sys.assemble_subdomains(h, fixed))
        Hd = asm(elem_h)
        acts["matrixAssembly"] = _time_call(asm, elem_h, reps=reps)
        # time what the step really runs: quasi-Newton H0 rebuilds use
        # the fast (bf16-SYRK / tiered) factorization, not the exact one
        fac = jax.jit(sys.factorize_fast)
        L, d = fac(Hd)
        acts["numericalFactorization"] = _time_call(fac, Hd, reps=reps)
        if hasattr(state, "chol"):
            # pass the (large) factors as ARGUMENTS — closed-over they
            # are serialized as constants into the remote-compile request
            solve = jax.jit(lambda chol, equil, q:
                            sys.h0_apply(chol, equil, q))
            g = jax.jit(
                lambda x: sys.gradient(x, x_tilta, fixed, *sys.fsvd(x)))(x)
            acts["backSolve"] = _time_call(solve, state.chol, state.equil,
                                           -g, reps=reps)
            acts["modifySearchDir"] = _time_call(
                jax.jit(lambda eh, p: sys.quadratic_form(eh, p)),
                state.elem_h, solve(state.chol, state.equil, -g), reps=reps)
    return acts


def format_activities(acts):
    """info.txt block in the reference's `N activities:` shape
    (main.cpp:864-888)."""
    lines = [f"{len(acts)} activities (s/call, isolated jitted stages):"]
    for k, v in sorted(acts.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {v:10.6f} s: {k}")
    return "\n".join(lines)
