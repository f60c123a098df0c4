"""Steady-state per-scene timings (compile excluded): warm up a few
frames, then time `--frames` more. Appends one JSON line per scene to
stdout; meant to run AFTER a batch pass has populated the compile cache.

    python tools/time_scenes.py scene1.txt scene2.txt ... [--frames 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="+")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--output-root", default="output")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dot_tpu.sim import Simulator, pick_dtype
    from dot_tpu.config import Config

    for path in args.scenes:
        try:
            cfg = Config.load(path)
            out = os.path.join(args.output_root,
                               "timed_" + cfg.output_folder_name())
            sim = Simulator(cfg, out, dtype=pick_dtype(), save_every=10 ** 9, render=False,
                            mute=True,
                            search_dirs=(os.path.dirname(path),
                                         os.path.dirname(os.path.dirname(path))))
            sim.run(args.warmup)
            it0 = sim.inner_iter_total
            f0 = sim.frame
            t0 = time.perf_counter()
            sim.run(args.frames)
            n = max(sim.frame - f0, 1)  # scene may have fewer frames left
            spf = (time.perf_counter() - t0) / n
            iters = (sim.inner_iter_total - it0) / n
            sim.finalize()
            print(json.dumps({"scene": os.path.basename(path),
                              "stepper": cfg.time_stepper,
                              "sec_per_frame": round(spf, 4),
                              "iters_per_frame": round(iters, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"scene": os.path.basename(path),
                              "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
