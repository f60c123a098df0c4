#!/usr/bin/env python
"""Collect reference-binary run artifacts into baselines/<scene>_cpu/.

Copies the light output-contract files (config/info/iterStats/log) and
derives timing.txt from the per-frame status/obj file mtimes (the
headless reference binary writes one surface obj + status per frame;
their mtime deltas are the per-frame wall-clock record for runs that
were stopped before info.txt was written).

Usage: python tools/collect_ref_baselines.py SRC_DIR DEST_NAME
"""

import os
import shutil
import sys


def collect(src, dest):
    os.makedirs(dest, exist_ok=True)
    for f in ("config.txt", "info.txt", "iterStats.txt", "log.txt"):
        p = os.path.join(src, f)
        if os.path.exists(p):
            shutil.copy2(p, dest)
    # per-frame wall-clock from obj mtimes
    frames = []
    for f in os.listdir(src):
        if f.endswith(".obj") and f[:-4].isdigit():
            frames.append((int(f[:-4]), os.path.getmtime(os.path.join(src, f))))
    frames.sort()
    if len(frames) >= 2:
        with open(os.path.join(dest, "timing.txt"), "w") as out:
            out.write("# frame epoch_mtime dt_since_prev(s)\n")
            prev = None
            deltas = []
            for n, t in frames:
                d = (t - prev) if prev is not None else 0.0
                if prev is not None:
                    deltas.append(d)
                out.write(f"{n} {t:.3f} {d:.3f}\n")
                prev = t
            import statistics
            out.write(f"# frames {len(frames)}  mean_s_per_frame "
                      f"{statistics.mean(deltas):.4f}  median "
                      f"{statistics.median(deltas):.4f}\n")
        import statistics
        return len(frames), statistics.mean(deltas)
    return len(frames), float("nan")


if __name__ == "__main__":
    n, spf = collect(sys.argv[1], sys.argv[2])
    print(f"{sys.argv[2]}: {n} frames, {spf:.3f} s/frame")
