#!/usr/bin/env python
"""Stage breakdown of the DOT per-frame FIXED cost (the end-of-step H0
rebuild, DOTTimeStepper.cpp:348-380's role) at blockSize scale:

  elem_h       element Hessians at x (fsvd + rank-1 eigen sums)
  coarse       two-level rigid-mode coarse factor (_coarse_factor)
  band_compact stage-1 compact unique-block assembly + masking
  chunk_rest   chunked band materialization + BTD factorization
               (the part of _rebuild_banded_chunked after the compact)
  rebuild_all  the whole _rebuild_h0 (cross-check; >= sum of the parts)

Each stage is timed as its own jitted call with the System and state as
JIT ARGUMENTS (never closures — constants blow the remote-compile cap).

Usage: python tools/rebuild_profile.py [scene.txt] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default="output/scalab/bar135_dot1k.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    from dot_tpu.config import Config
    from dot_tpu.sim import Simulator, pick_dtype

    cfg = Config.load(args.scene)
    out = os.path.join("output", "profrb_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9,
                    mute=True, render=False)
    sim.run(args.frames)   # compile + settle into a deformed state
    sys_ = sim.system
    x, fixed = sim.state.x, sim.state.fixed
    print(f"P={sys_.n_parts} n3={sys_.n3} band=({sys_.band_bs},{sys_.band_nb}) "
          f"nEp={sys_.n_elem_p} chunked={getattr(sys_, '_chunk', None) is not None} "
          f"coarse={sys_.use_coarse}")

    def timeit(fn, *a):
        r = fn(*a)                       # compile
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn(*a)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    @jax.jit
    def f_elem(s, x):
        _, U, sg, V = s.fsvd(x)
        return s.element_hessians(U, sg, V)

    elem_h = f_elem(sys_, x)
    jax.block_until_ready(elem_h)

    stages = {"elem_h": (f_elem, (sys_, x))}
    if sys_.use_coarse:
        stages["coarse"] = (jax.jit(lambda s, eh, fx: s._coarse_factor(
            eh, fx)), (sys_, elem_h, fixed))
    if getattr(sys_, "_chunk", None) is not None:
        stages["band_compact"] = (jax.jit(lambda s, eh, fx: s._band_compact(
            eh, fx)), (sys_, elem_h, fixed))
        stages["chunk_all"] = (jax.jit(
            lambda s, eh, fx: s._rebuild_banded_chunked(eh, fx)),
            (sys_, elem_h, fixed))
    elif sys_.banded:
        stages["assemble_btd"] = (jax.jit(
            lambda s, eh, fx: s.assemble_subdomains(eh, fx)),
            (sys_, elem_h, fixed))
        stages["factorize"] = (jax.jit(
            lambda s, eh, fx: s.factorize_fast(
                s.assemble_subdomains(eh, fx))), (sys_, elem_h, fixed))
    stages["rebuild_all"] = (jax.jit(lambda s, x, fx: s._rebuild_h0(
        x, fx)), (sys_, x, fixed))

    for name, (fn, a) in stages.items():
        dt = timeit(fn, *a)
        print(f"{name:13s} {dt * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
