#!/usr/bin/env python
"""Per-stage cost attribution for the ADMM-DD iteration on real hardware.

The ADMM-DD chunk is one jitted while_loop; isolated stage timings through
eager dispatch include a tunnel round trip per call, so each stage is
timed as a jitted 32-iteration fori_loop over JUST that stage's ops (the
carry threads the stage output back in, so XLA cannot elide the work).
This attributes the ~per-iteration cost to:

  local_grad   local fsvd + augmented local gradient (elem chain + scatter)
  local_solve  banded/dense per-subdomain backsolve
  line_search  direction fsvd + 1 trial + the two W-quadratic matvecs
  consensus    W matvec + scatter + dense consensus triangular solves
  global_chk   global fsvd + gradient + energy (the per-iteration
               convergence test, reference ADMMDDTimeStepper.cpp:644-671)
  h_refresh    the every-20-iteration local Hessian rebuild+factorize,
               reported amortized (/20)

Usage: python tools/admmdd_profile.py [scene.txt] [n_parts]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = 32


def timeit(fn, *args):
    import jax
    out = fn(*args)           # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / LOOP


def main():
    import jax
    import jax.numpy as jnp
    from dot_tpu.config import Config
    from dot_tpu.sim import Simulator, pick_dtype

    script = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("DOT_DATA_ROOT", "/root/reference"),
        "input/otherMethods/monkey18K_TSS_ADMMDD_E2.5e4.txt")
    cfg = Config.load(script)
    if len(sys.argv) > 2:
        cfg.partition_amt = int(sys.argv[2])
    out = os.path.join("output", "profadmm_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9,
                    mute=True, render=False)
    sim.run(2)   # compile + settle into a deformed state
    stepper = sim.stepper
    sys_ = stepper.system
    state = sim.state
    P, n3, nmax = sys_.n_parts, sys_.n3, stepper.nmax
    print(f"scene {os.path.basename(script)}: P={P} n3={n3} "
          f"n_shared={stepper.n_shared} ns3={stepper.ns3} "
          f"nEp={sys_.n_elem_p} banded_local={stepper.banded_local}")

    tol = jnp.asarray(sys_.target_g_res(1e-5), jnp.float64)
    env, carry = stepper._prelude(stepper, state, tol)
    (fixed, _vs, _rl, wv, free3f, xhat_flat, Lc, dc, x_tilta) = env
    wpack = (wv, free3f)
    (xl_flat, z, u_loc, L0, d0, e, sqn_g, it, rows) = carry[:9]

    from dot_tpu.kernels import soa

    # ---- stage bodies --------------------------------------------------
    # Everything big (the stepper pytree, factors, local states) is passed
    # as a JIT ARGUMENT — closing over them would bake multi-GB constants
    # into the HLO and blow the remote-compile request cap (HTTP 413, the
    # round-3 lesson; see steppers/core.StaticPytree).
    pack = dict(xl_flat=xl_flat, z=z, u_loc=u_loc, L0=L0, d0=d0, Lc=Lc,
                dc=dc, fixed=fixed, wv=wv, free3f=free3f,
                xhat_flat=xhat_flat, x_tilta=x_tilta)

    def local_grad_body(st, pk, c):
        xl = c
        wp = (pk["wv"], pk["free3f"])
        f9 = st._local_fsvd(xl)
        U, s, V = soa.svd3_flip_soa(f9)
        gl = st._local_gradient(xl, pk["xhat_flat"], pk["z"], pk["u_loc"],
                                wp, pk["fixed"], f9, U, s, V)
        return xl + 1e-30 * st._to_flat(gl.reshape(P, nmax, 3))

    def local_solve_body(st, pk, c):
        r = c
        zz = st.system.solve_local(pk["L0"], r)
        return r + 1e-30 * zz.astype(r.dtype)

    def line_search_body(st, pk, c):
        p_flat = c
        s_ = st.system
        wp = (pk["wv"], pk["free3f"])
        fp9 = st._local_fsvd(p_flat)
        f9 = st._local_fsvd(pk["xl_flat"])
        ff = tuple(f + 0.5 * fp for f, fp in zip(f9, fp9))
        _, ss, _ = soa.svd3_flip_soa(ff)
        psi_w = s_.mat_soa.psi(ss, s_.u_e, s_.lam_e) * s_.vol_w
        e_el = jnp.sum(psi_w.reshape(P, -1), axis=1)
        aug0 = st._aug_vec(pk["xl_flat"], pk["z"], pk["u_loc"])
        pa = p_flat[:-1].reshape(P, n3)
        Wa0 = st.w_matvec(wp[0], wp[1], aug0)
        Wpa = st.w_matvec(wp[0], wp[1], pa)
        s1 = jnp.sum(pa * Wa0) + jnp.sum(aug0 * Wpa) + jnp.sum(e_el)
        return p_flat + 1e-30 * s1

    def consensus_body(st, pk, c):
        zc_in = c
        s_ = st.system
        wp = (pk["wv"], pk["free3f"])
        xl = pk["xl_flat"][:-1].reshape(P, nmax, 3)
        zg = zc_in[s_.l2g]
        aug = (1.8 * xl - 0.8 * zg + pk["u_loc"] - zg).reshape(P, n3)
        t = st.w_matvec(wp[0], wp[1], aug).reshape(P * nmax, 3)
        rhs_sh = jnp.zeros((st.n_shared + 1, 3), s_.dtype)
        rhs_sh = rhs_sh.at[st.l2shared.reshape(-1)].add(t)
        rhs_full = jnp.concatenate(
            [rhs_sh[:st.n_shared],
             jnp.zeros((1, 3), s_.dtype)]).reshape(st.ns3)
        rc = (rhs_full / pk["dc"])[:, None].astype(s_._solve_dtype)
        yc = jax.lax.linalg.triangular_solve(pk["Lc"], rc, left_side=True,
                                             lower=True)
        zc = jax.lax.linalg.triangular_solve(pk["Lc"], yc, left_side=True,
                                             lower=True, transpose_a=True)
        dz = (zc[:, 0].astype(s_.dtype) / pk["dc"]).reshape(-1, 3)
        return zc_in.at[st.shared_ids].add(1e-30 * dz[:st.n_shared])

    def global_chk_body(st, pk, c):
        zz = c
        s_ = st.system
        F, Ug, sg, Vg = s_.fsvd(zz)
        gg = s_.gradient(zz, pk["x_tilta"], pk["fixed"], F, Ug, sg, Vg)
        ee = s_.energy(zz, pk["x_tilta"], sg)
        return zz + 1e-30 * gg + 1e-30 * ee

    def h_refresh_body(st, pk, c):
        xl = c
        wp = (pk["wv"], pk["free3f"])
        _, L, d = st._local_h_factor(xl, wp, pk["fixed"])
        leaf = L.linv if hasattr(L, "linv") else L
        return xl + 1e-30 * jnp.sum(leaf.astype(xl.dtype))

    stages = {
        "local_grad": (local_grad_body, xl_flat),
        "local_solve": (local_solve_body,
                        jnp.ones((P, n3), sys_.dtype)),
        "line_search": (line_search_body, xl_flat),
        "consensus": (consensus_body, z),
        "global_chk": (global_chk_body, z),
        "h_refresh": (h_refresh_body, xl_flat),
    }

    results = {}
    for bid, (name, (body, init)) in enumerate(stages.items()):
        fn = jax.jit(lambda st, pk, c, _b=body: jax.lax.fori_loop(
            0, LOOP, lambda i, cc: _b(st, pk, cc), c))
        dt = timeit(fn, stepper, pack, init)
        results[name] = dt
        print(f"{name:12s} {dt * 1e3:8.2f} ms/iter"
              + ("  (/20 amortized: %.2f ms)" % (dt * 1e3 / 20)
                 if name == "h_refresh" else ""))

    per_iter = (results["local_grad"] + results["local_solve"]
                + results["line_search"] + results["consensus"]
                + results["global_chk"] + results["h_refresh"] / 20)
    print(f"\nsum (1 trial, refresh/20): {per_iter * 1e3:.2f} ms/iter")

    # measured whole-chunk slope for cross-check
    it_before = int(jax.device_get(it))   # before donation deletes it
    t0 = time.perf_counter()
    c2 = stepper._chunk(stepper, env, carry, tol)
    jax.block_until_ready(c2[0])
    dt_chunk = time.perf_counter() - t0
    iters = int(jax.device_get(c2[7])) - it_before
    print(f"real chunk: {iters} iters in {dt_chunk:.2f}s "
          f"-> {dt_chunk / max(iters, 1) * 1e3:.2f} ms/iter "
          f"(includes compile on first call)")
    it2 = int(jax.device_get(c2[7]))   # before donation deletes it
    t0 = time.perf_counter()
    c3 = stepper._chunk(stepper, env, c2, tol)
    jax.block_until_ready(c3[0])
    dt_chunk = time.perf_counter() - t0
    iters = int(jax.device_get(c3[7])) - it2
    if iters:
        print(f"warm chunk: {iters} iters in {dt_chunk:.2f}s "
              f"-> {dt_chunk / iters * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
