#!/usr/bin/env python
"""Headline benchmark: sec/frame on bar17K_twist at the reference's
canonical DOT configuration (FCR, BE, DOT 6 subdomains, warmStart 2,
dt = 0.025, E = 1e5, nu = 0.4, rho = 1000 — input/bar17K_twist_DOT.txt),
characteristic-gradient tolerance relTol = 1e-5.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference repo publishes no numbers (BASELINE.md); the
north-star target is >=5x lower sec/frame than 12-thread MKL/CHOLMOD CPU
DOT on this scene. `vs_baseline` is computed against the MEASURED
reference-binary run recorded in BASELINE_CPU.json (9.349 s/frame for
the full 200-frame bar17K_twist under DOT6 on this host — built and run
from the reference sources; see that file's caveat: this host has 1 CPU
core vs the paper's 12 threads, so the true 12-thread ratio is lower).
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
    out = os.path.join("output", "bench_" + cfg.output_folder_name())
    sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9,
                    mute=True)

    # warmup: compile + settle
    sim.run(warmup)
    t0 = time.perf_counter()
    sim.run(frames)
    spf = (time.perf_counter() - t0) / frames
    sim.finalize()

    baseline = PLACEHOLDER_CPU_SPF
    if os.path.exists("BASELINE_CPU.json"):
        with open("BASELINE_CPU.json") as f:
            baseline = json.load(f).get("bar17K_twist_DOT6_sec_per_frame",
                                        baseline)

    print(json.dumps({
        "metric": "sec_per_frame_bar17K_twist_DOT6",
        "value": round(spf, 5),
        "unit": "s/frame",
        "vs_baseline": round(baseline / spf, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
