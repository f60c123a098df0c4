#!/usr/bin/env python
"""Differential in-situ cost attribution for the jitted DOT step.

The whole inner solve is one XLA program; isolated stage timings include
a device-tunnel round trip per call, so their sums wildly exceed the real
frame time. This tool measures the REAL costs by differencing whole-frame
times between controlled variants:

  per-iteration slope: force the iteration count via tol scaling and fit
      sec/frame against measured inner iterations;
  fixed part: extrapolate to zero iterations (assembly + factorization +
      warm start + BE update + initial energy/gradient).

Usage: python tools/insitu_profile.py [script.txt] [--frames N]
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
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from dot_tpu.config import Config
    from dot_tpu.sim import Simulator, pick_dtype

    cfg = Config.load(args.script)
    out = os.path.join("output", "profile_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9, render=False,
                    mute=True)

    # warm up + compile at the default tolerance
    sim.run(3)

    stepper = sim.stepper
    state = sim.state

    def run_frames(rel_tol, n):
        nonlocal state
        # warm/settle one frame at this tol (compile shares the trace, but
        # the tol scalar upload happens once here)
        state, _ = stepper.step(state, rel_tol=rel_tol)
        np.asarray(state.x[0])
        all_stats = []
        t0 = time.perf_counter()
        for _ in range(n):
            state, (stats, sys_e) = stepper.step(state, rel_tol=rel_tol)
            all_stats.append(stats.inner_iters)   # device scalars, no sync
        np.asarray(state.x[0])
        dt = (time.perf_counter() - t0) / n
        iters = float(np.mean([int(s) for s in all_stats]))
        return dt, iters

    # sweep tolerances to vary the iteration count; read iters from stats
    results = []
    for rel_tol in (3.0e-3, 1.0e-3, 1.0e-4, 1.0e-5, 1.0e-6):
        dt, iters = run_frames(rel_tol, args.frames)
        results.append((rel_tol, dt, iters))
        print(f"relTol {rel_tol:8.1e}: {dt*1e3:8.2f} ms/frame at "
              f"{np.mean(iters):6.2f} iters/frame", flush=True)

    its = np.asarray([r[2] for r in results])
    ts = np.asarray([r[1] for r in results])
    A = np.stack([its, np.ones_like(its)], axis=1)
    slope, fixed = np.linalg.lstsq(A, ts, rcond=None)[0]
    print(f"\nper-iteration cost : {slope*1e3:8.2f} ms")
    print(f"per-frame fixed    : {fixed*1e3:8.2f} ms "
          f"(assembly+factorize+warmstart+BE+initial E/g)")
    sim.state = state   # the original was donated away by our steps


if __name__ == "__main__":
    main()
