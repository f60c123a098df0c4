"""Batch runner: simulate every scene script in a folder
(reference: batch.py — runs input/{1,8,12,32}/*.txt suites).

    python -m dot_tpu.batch /root/reference/input/otherMethods --frames 10

Each scene runs in its OWN subprocess: a scene that exhausts device
memory (or crashes the runtime) must not poison the scenes after it —
compiled executables pin their captured constants in device HBM for the
life of the process, so sequential in-process runs accumulate.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys


def run_one(path, args):
    cmd = [sys.executable, "-m", "dot_tpu", "100", path, "batch",
           "--save-every", str(args.save_every),
           "--output-root", args.output_root]
    if args.frames is not None:
        cmd += ["--frames", str(args.frames)]
    if args.dtype:
        cmd += ["--dtype", args.dtype]
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=args.timeout or None)
    out = res.stdout + res.stderr
    m = re.search(r"done: (\d+)/\d+ frames, ([0-9.]+) s/frame"
                  r"(?:, steady ([0-9.]+) s/frame)?", out)
    if res.returncode != 0 or not m:
        tail = "\n".join(out.strip().splitlines()[-4:])
        return None, None, f"FAILED rc={res.returncode}: {tail[-300:]}"
    spf = float(m.group(3) or m.group(2))   # steady-state when available
    return spf, int(m.group(1)), "ok"


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dot_tpu.batch")
    ap.add_argument("folder")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--dtype", choices=["f32", "f64"], default=None)
    ap.add_argument("--save-every", type=int, default=10 ** 9)
    ap.add_argument("--output-root", default="output")
    ap.add_argument("--timeout", type=int, default=0,
                    help="per-scene wall-clock limit in seconds (0 = none)")
    args = ap.parse_args(argv)

    scripts = sorted(glob.glob(os.path.join(args.folder, "*.txt")))
    if not scripts:
        print(f"no scene scripts in {args.folder}")
        return 1
    results = []
    for path in scripts:
        name = os.path.basename(path)
        try:
            spf, frames, status = run_one(path, args)
        except subprocess.TimeoutExpired:
            spf, frames, status = None, None, "FAILED: timeout"
        results.append((name, spf, frames, status))
        print(f"[batch] {name}: "
              f"{'%.3f s/frame' % spf if spf else status}", flush=True)
    print("\n=== batch summary ===")
    for name, spf, frames, status in results:
        s = f"{spf:8.3f}" if spf is not None else "     nan"
        print(f"{name:45s} {s} s/frame  frames={frames}  {status}")
    return 0 if all(r[3] == "ok" for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
