#!/usr/bin/env python
"""On-device per-op microbenchmarks for the DOT step's hot stages.

Each stage runs `reps` times chained inside ONE jitted lax.fori_loop
(data dependencies prevent hoisting), so the per-rep time is the true
on-device cost — no tunnel round trip, no dispatch overhead.

Usage: python tools/microbench.py [script.txt]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("script", nargs="?",
                    default="/root/reference/input/bar17K_twist_DOT.txt")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dot_tpu.config import Config
    from dot_tpu.sim import Simulator, pick_dtype

    cfg = Config.load(args.script)
    out = os.path.join("output", "mb_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9, render=False,
                    mute=True)
    sim.run(2)
    stepper = sim.stepper
    state = sim.state
    sys_ = stepper.system
    R = args.reps

    def timed(name, fn, *arg):
        f = jax.jit(fn)
        o = f(sys_, *arg)
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        t0 = time.perf_counter()
        o = f(sys_, *arg)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / R
        print(f"{name:28s} {dt*1e3:9.3f} ms/rep", flush=True)
        return dt

    x, fixed, x_tilta = state.x, state.fixed, state.x_tilta
    L, d = state.chol, state.equil
    elem_h = state.elem_h

    # --- per-iteration stages -----------------------------------------
    def loop_fsvd(sy, x):
        def body(i, x):
            F, U, s, V = sy.fsvd(x)
            return x * (1.0 + 1e-12 * s[0][0])
        return jax.lax.fori_loop(0, R, body, x)

    timed("fsvd (F+SVD all elems)", loop_fsvd, x)

    def loop_grad(sy, x):
        def body(i, x):
            F, U, s, V = sy.fsvd(x)
            g = sy.gradient(x, x_tilta, fixed, F, U, s, V)
            return x + 1e-12 * g
        return jax.lax.fori_loop(0, R, body, x)

    timed("fsvd+gradient", loop_grad, x)

    def loop_h0(sy, L, d, q):
        def body(i, q):
            return sy.h0_apply(L, d, q)
        return jax.lax.fori_loop(0, R, body, q)

    timed("h0_apply (BTD solve)", loop_h0, L, d, jnp.ones_like(x))

    F0 = sys_.defgrad(x)
    Fp = tuple(1e-3 * f for f in F0)

    def loop_lstrial(sy, F0, Fp, a):
        def body(i, a):
            F = tuple(f0 + a * fp for f0, fp in zip(F0, Fp))
            from dot_tpu.kernels import soa
            U, s, V = soa.svd3_flip_soa(F)
            e = sy.elastic_energy_sigma(s)
            return a * (1.0 + 1e-12 * e)
        return jax.lax.fori_loop(0, R, body, a)

    timed("line-search trial (SVD+psi)", loop_lstrial, F0, Fp,
          jnp.asarray(0.5, sys_.dtype))

    def loop_twoloop(sy, st, g):
        bufs = (st.lb_s, st.lb_t, st.lb_rho, st.lb_valid)

        def body(i, g):
            p = stepper._two_loop(st, g, bufs)
            return g + 1e-12 * p
        return jax.lax.fori_loop(0, R, body, g)

    timed("two_loop (incl h0_apply)", loop_twoloop, state,
          jnp.ones_like(x))

    def loop_quadform(sy, eh, p):
        def body(i, p):
            q = sy.quadratic_form(eh, p)
            return p * (1.0 + 1e-12 * q)
        return jax.lax.fori_loop(0, R, body, p)

    timed("alpha-init quadratic form", loop_quadform, elem_h,
          jnp.ones_like(x))

    # --- per-frame fixed stages ---------------------------------------
    _, U, s, V = sys_.fsvd(x)

    def loop_elemh(sy, U, s, V, c):
        def body(i, c):
            s2 = (s[0] * c, s[1], s[2])
            h = sy.element_hessians(U, s2, V)
            return c * (1.0 + 1e-12 * h[0][0])
        return jax.lax.fori_loop(0, R, body, c)

    timed("element_hessians", loop_elemh, U, s, V,
          jnp.asarray(1.0, sys_.dtype))

    def loop_asm(sy, eh, c):
        def body(i, c):
            Hd = sy.assemble_subdomains(eh * c, fixed)
            lead = Hd[0] if isinstance(Hd, tuple) else Hd
            return c * (1.0 + 1e-12 * lead.ravel()[0])
        return jax.lax.fori_loop(0, R, body, c)

    timed("assemble_subdomains", loop_asm, elem_h,
          jnp.asarray(1.0, sys_.dtype))

    def loop_fac(sy, eh, c):
        Hd = sy.assemble_subdomains(eh, fixed)

        def body(i, c):
            if isinstance(Hd, tuple):
                Hc = tuple(h * c for h in Hd)
            else:
                Hc = Hd * c
            Lf, df = sy.factorize_fast(Hc)
            lead = Lf.linv if hasattr(Lf, "linv") else Lf
            return c * (1.0 + 1e-12 * lead.ravel()[0].astype(sy.dtype))
        return jax.lax.fori_loop(0, R, body, c)

    timed("factorize_fast", loop_fac, elem_h,
          jnp.asarray(1.0, sys_.dtype))

    sim.state = state


if __name__ == "__main__":
    main()
