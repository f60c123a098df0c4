"""CLI entry: `python -m dot_tpu <mode> <script.txt> [suffix]`

Mirrors the reference binary's interface (reference: main.cpp:599-664):
  mode 0/10/100 : simulate the scene script (all offline/headless here)
  mode 1        : diagnostics (11 = derivative unit tests, via pytest files)
  mode 2        : mesh processing utilities

Extra flags (ours): --frames N, --dtype {f32,f64}, --save-every K.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dot_tpu")
    ap.add_argument("mode", help="0/10/100 sim, 1 diagnostic, 2 mesh proc")
    ap.add_argument("script", nargs="?", help="scene script .txt / sub-mode")
    ap.add_argument("suffix", nargs="?", default="", help="output folder tag")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--dtype", choices=["f32", "f64"], default=None)
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--output-root", default="output")
    args = ap.parse_args(argv)

    if args.mode in ("0", "10", "11", "100"):
        from .sim import run_script
        sim, spf = run_script(args.script, suffix=args.suffix,
                              frames=args.frames, dtype=args.dtype,
                              output_root=args.output_root,
                              save_every=args.save_every)
        print(f"done: {sim.frame}/{sim.frame_amt} frames, {spf:.4f} s/frame")
        print(f"output: {sim.out}")
    elif args.mode == "1":
        # diagnostic mode: derivative unit tests (reference Diagnostic 11)
        import pytest
        sys.exit(pytest.main(["-q", "tests/test_materials.py",
                              "tests/test_svd3.py"]))
    elif args.mode == "2":
        from . import io as meshio
        sub = args.script
        if sub == "surface":
            # extract surface tris: mode 2 case 15 (MeshProcessing.hpp:604)
            import os
            v, tt, sf = meshio.read_tet_mesh(args.suffix)
            out = os.path.basename(args.suffix) + ".obj"  # write to cwd,
            # never next to the (possibly read-only) input mesh
            meshio.write_obj(out, v, sf)
            print(f"wrote {out}")
        else:
            print("mesh-processing sub-modes: surface <path.msh>")
    else:
        print(f"unknown mode {args.mode}")
        sys.exit(1)


if __name__ == "__main__":
    main()
