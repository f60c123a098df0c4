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
    # free the sim's live factors/state so the chunked-rebuild stages
    # (which allocate their own full-size factor accumulators) fit HBM
    sim.state = None
    sim.stepper = None
    import gc
    gc.collect()
    print(f"P={sys_.n_parts} n3={sys_.n3} band=({sys_.band_bs},{sys_.band_nb}) "
          f"nEp={sys_.n_elem_p} chunked={getattr(sys_, '_chunk', None) is not None} "
          f"coarse={sys_.use_coarse}")

    import jax.numpy as jnp

    def _sync(r):
        """Force a host fetch: on the axon tunnel jax.block_until_ready
        returns without waiting for device execution — only a host
        round-trip of a value actually synchronizes."""
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    # measured host round-trip (subtracted from each timing)
    _one = jax.jit(lambda v: v + 1)
    _z = jnp.zeros((1,))
    _sync(_one(_z))
    _rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(_one(_z))
        _rtts.append(time.perf_counter() - t0)
    rtt = sorted(_rtts)[2]
    print(f"host RTT {rtt * 1e3:.1f} ms")

    def timeit(fn, *a):
        _sync(fn(*a))                    # compile
        t0 = time.perf_counter()
        for _ in range(args.reps - 1):
            fn(*a)                       # enqueue; ref dropped (memory)
        _sync(fn(*a))
        return (time.perf_counter() - t0 - rtt) / args.reps

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
