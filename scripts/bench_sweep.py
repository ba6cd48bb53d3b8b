"""Benchmark sweep over (variant, resolution) — produces the FPS table that
mirrors the reference README's benchmark section (dev tool, real TPU).

Usage: python scripts/bench_sweep.py [--out bench_results.json]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import sys

# full ladder mirroring the reference README table (BASELINE.md):
# S/M/L/XL x 640x480 / 1216x1024 / 2432x2048
CONFIGS = [
    (m, w, h)
    for m in ("S", "M", "L", "XL")
    for (w, h) in ((640, 480), (1216, 1024), (2432, 2048))
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results.json")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--models", default="S,M,L,XL",
                    help="comma-separated subset of variants to run")
    args = ap.parse_args()
    models = set(args.models.split(","))

    results = []
    for model, w, h in CONFIGS:
        if model not in models:
            continue
        cmd = [sys.executable, "bench.py", "--model", model,
               "--width", str(w), "--height", str(h),
               "--iters", str(args.iters)]
        print(">>", " ".join(cmd), flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3600)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            results.append(json.loads(line))
            print(line, flush=True)
        except Exception as e:
            print(f"FAILED {model} {w}x{h}: {e}", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
