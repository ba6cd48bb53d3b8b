"""Benchmark sweep over (variant, resolution) — produces the FPS table that
mirrors the reference README's benchmark section (dev tool, real TPU).

Usage: python scripts/bench_sweep.py [--out bench_results.json]
"""
import argparse
import json
import subprocess
import sys

CONFIGS = [
    ("S", 640, 480), ("S", 1216, 1024),
    ("M", 640, 480), ("M", 1216, 1024),
    ("L", 1216, 1024),
    ("XL", 1216, 1024),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results.json")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    results = []
    for model, w, h in CONFIGS:
        cmd = [sys.executable, "bench.py", "--model", model,
               "--width", str(w), "--height", str(h),
               "--iters", str(args.iters)]
        print(">>", " ".join(cmd), flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=2400)
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
