#!/usr/bin/env python
"""Load a serialized StableHLO artifact and benchmark it — the analog of the
reference's raw-binding TensorRT benchmark (reference: demo/trt_inference_test.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", help="path to a .stablehlo artifact")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from s2m2_tpu.tools.export import load_artifact

    fn = load_artifact(args.artifact)
    # shapes are baked into the artifact; probe them from the error-free call
    import re
    m = re.search(r"_(\d+)x(\d+)_", os.path.basename(args.artifact))
    if not m:
        print("cannot infer resolution from filename")
        return 1
    w, h = int(m.group(1)), int(m.group(2))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32)

    @jax.jit
    def step(s, a):
        disp, occ, conf = fn(a + (s * 1e-12).astype(a.dtype), a)
        return s + disp.mean()

    s = step(jnp.float32(0), a)
    float(s)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = step(s, a)
    float(s)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{os.path.basename(args.artifact)}: {dt * 1e3:.1f} ms/frame "
          f"({1 / dt:.1f} FPS)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
