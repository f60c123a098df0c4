"""Batch runner: simulate every scene script in a folder
(reference: batch.py — runs input/{1,8,12,32}/*.txt suites).

    python -m dot_tpu.batch /root/reference/input/otherMethods --frames 10
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import traceback


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dot_tpu.batch")
    ap.add_argument("folder")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--dtype", choices=["f32", "f64"], default=None)
    ap.add_argument("--save-every", type=int, default=10 ** 9)
    ap.add_argument("--output-root", default="output")
    args = ap.parse_args(argv)

    from .sim import run_script

    scripts = sorted(glob.glob(os.path.join(args.folder, "*.txt")))
    if not scripts:
        print(f"no scene scripts in {args.folder}")
        return 1
    results = []
    for path in scripts:
        name = os.path.basename(path)
        try:
            sim, spf = run_script(path, frames=args.frames, dtype=args.dtype,
                                  output_root=args.output_root,
                                  save_every=args.save_every)
            results.append((name, spf, sim.inner_iter_total, "ok"))
        except Exception as e:  # keep the batch going
            traceback.print_exc()
            results.append((name, float("nan"), 0, f"FAILED: {e}"))
    print("\n=== batch summary ===")
    for name, spf, iters, status in results:
        print(f"{name:45s} {spf:8.3f} s/frame  iters={iters:5d}  {status}")
    return 0 if all(r[3] == "ok" for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
