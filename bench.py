#!/usr/bin/env python
"""Headline benchmark: sec/frame on bar17K_twist at the reference's
canonical DOT configuration (FCR, BE, DOT 6 subdomains, warmStart 2,
dt = 0.025, E = 1e5, nu = 0.4, rho = 1000 — input/bar17K_twist_DOT.txt),
characteristic-gradient tolerance relTol = 1e-5.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference repo publishes no numbers (BASELINE.md); the
north-star target is >=5x lower sec/frame than 12-thread MKL/CHOLMOD CPU
DOT on this scene. Two baselines are reported:

- `vs_baseline_1core_measured`: against the MEASURED reference-binary
  run in BASELINE_CPU.json (9.349 s/frame for 200-frame bar17K_twist
  DOT6 on this host — built and run from the reference sources, but on
  1 CPU core with netlib BLAS vs the paper's 6C/12T MKL machine).
- `vs_baseline_12thread_est`: the honest headline — the measured 1-core
  number divided by 6 (the conservative end of the 4-8x range a 6C/12T
  MKL machine gains over this 1-core netlib build; see
  baselines/README.md). `vs_baseline` carries THIS conservative figure.
"""

import json
import os
import sys
import time

PLACEHOLDER_CPU_SPF = 1.0  # s/frame; see module docstring


def main():
    import jax
    from dot_tpu.sim import Simulator, pick_dtype
    from dot_tpu.config import Config

    script = os.environ.get(
        "DOT_BENCH_SCRIPT",
        os.path.join(os.environ.get("DOT_DATA_ROOT", "/root/reference"),
                     "input/bar17K_twist_DOT.txt"))
    warmup = int(os.environ.get("DOT_BENCH_WARMUP", "3"))
    frames = int(os.environ.get("DOT_BENCH_FRAMES", "10"))

    cfg = Config.load(script)
    # Adaptive H0 refresh (dot_tpu extension, config key h0Refresh): the
    # reference refactorizes its frozen preconditioner every time step
    # (DOTTimeStepper.cpp:343) because a CHOLMOD refactor is cheap next
    # to its per-iteration cost; on TPU the rebuild is ~60% of a frame,
    # and extending the factor lifetime across frames changes neither
    # the tolerance nor the iteration count (measured 9.0 -> 8.7
    # iters/frame on this scene). Opt out with DOT_BENCH_H0REFRESH=1 to
    # benchmark strict reference refactorization semantics.
    cfg.h0_refresh = int(os.environ.get("DOT_BENCH_H0REFRESH", "-1"))
    out = os.path.join("output", "bench_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9,
                    mute=True, render=False)

    # warmup: compile + settle
    sim.run(warmup)
    t0 = time.perf_counter()
    sim.run(frames)
    spf = (time.perf_counter() - t0) / frames
    sim.finalize()

    baseline = PLACEHOLDER_CPU_SPF
    here = os.path.dirname(os.path.abspath(__file__))
    cpu_json = os.path.join(here, "BASELINE_CPU.json")
    if os.path.exists(cpu_json):
        with open(cpu_json) as f:
            baseline = json.load(f).get("bar17K_twist_DOT6_sec_per_frame",
                                        baseline)

    # The measured baseline binary ran on 1 core with netlib BLAS; the
    # paper's machine was 6C/12T MKL. Divide by 6 (conservative end of
    # the observed 4-8x multithread/MKL gain) for the honest headline.
    MT_SCALE = 6.0
    print(json.dumps({
        "metric": "sec_per_frame_bar17K_twist_DOT6",
        "value": round(spf, 5),
        "unit": "s/frame",
        "vs_baseline": round(baseline / MT_SCALE / spf, 3),
        "vs_baseline_1core_measured": round(baseline / spf, 3),
        "vs_baseline_12thread_est": round(baseline / MT_SCALE / spf, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
