"""Reference-parity harness: diff a dot_tpu run directory against a
reference-binary run directory (both use the same iterStats/log output
contract — reference: Optimizer.cpp:666-693, main.cpp:318-358).

Checks, per the paper's evaluation protocol:
  1. frame-0 row-0 (initial E, ||g||^2) — physics parity: same mesh load,
     script handle motion, warm start, energy/gradient. Must agree to
     ~1e-4 relative (f32 run vs f64 reference).
  2. per-frame converged E — trajectory drift report (different H0
     partitions give different-but-valid optimization paths; drift grows
     smoothly, like the reference under different METIS seeds).
  3. iters/frame — convergence-quality ratio vs the reference.

Usage:  python tools/parity.py <our_run_dir> <reference_run_dir> [maxF]
"""

from __future__ import annotations

import sys


def read_iterstats(path):
    rows = []
    for line in open(path):
        t = line.split()
        if len(t) >= 4:
            rows.append((int(t[0]), float(t[1]), float(t[2]), float(t[3])))
    return rows


def frame_stats(rows):
    first, last, iters = {}, {}, {}
    for f, a, e, g in rows:
        if f not in first:
            first[f] = (e, g)
            iters[f] = 0
        else:
            iters[f] += 1
        last[f] = (e, g)
    return first, last, iters


def compare(our_dir, ref_dir, max_frames=10 ** 9):
    ours = frame_stats(read_iterstats(f"{our_dir}/iterStats.txt"))
    ref = frame_stats(read_iterstats(f"{ref_dir}/iterStats.txt"))
    frames = sorted(set(ours[0]) & set(ref[0]))[:max_frames]
    if not frames:
        raise SystemExit("no overlapping frames")

    e0_o, g0_o = ours[0][frames[0]]
    e0_r, g0_r = ref[0][frames[0]]
    init_e_rel = abs(e0_o - e0_r) / max(abs(e0_r), 1e-300)
    init_g_rel = abs(g0_o - g0_r) / max(abs(g0_r), 1e-300)

    drift = []
    it_o = it_r = 0
    for f in frames:
        eo, er = ours[1][f][0], ref[1][f][0]
        drift.append(abs(eo - er) / max(abs(er), 1e-300))
        it_o += ours[2][f]
        it_r += ref[2][f]

    print(f"frames compared            : {len(frames)}")
    print(f"initial E   rel diff       : {init_e_rel:.3e}")
    print(f"initial |g|^2 rel diff     : {init_g_rel:.3e}")
    print(f"converged-E drift (max)    : {max(drift):.3e}")
    print(f"converged-E drift (median) : {sorted(drift)[len(drift)//2]:.3e}")
    print(f"iters/frame ours vs ref    : {it_o/len(frames):.2f} vs "
          f"{it_r/len(frames):.2f} (ratio {it_o/max(it_r,1):.2f})")
    ok = init_e_rel < 1e-3 and init_g_rel < 1e-3
    print("physics parity             :", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    mf = int(sys.argv[3]) if len(sys.argv) > 3 else 10 ** 9
    sys.exit(compare(sys.argv[1], sys.argv[2], mf))
