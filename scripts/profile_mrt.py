"""Fast stacked-MRT-only timing at XL@1216x1024 shapes (dev tool, real TPU).

For iterating on MRT formulation changes without recompiling the full model
(compare against the stacked_mrt row of profile_stages.py).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.mrt import stacked_mrt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))["transformer"]
    c = cfg.ch
    h4, w4 = args.height // 4, args.width // 4
    rng = np.random.default_rng(0)
    zs = [jnp.asarray(rng.standard_normal((2, h4 // s, w4 // s, d)) * 0.1,
                      jnp.bfloat16)
          for d, s in ((c, 1), (c, 2), (2 * c, 4), (2 * c, 8))]

    def step(p, s, z0, z1, z2, z3):
        # params must be jit ARGS, not closure constants: the axon tunnel
        # remote-compiles the serialized module and embedded-constant
        # weights blow its request-size limit (HTTP 413)
        eps = (s * 1e-12).astype(z0.dtype)
        out = stacked_mrt(p, z0 + eps, z1, z2, z3,
                          num_transformer=cfg.num_transformer,
                          num_heads=cfg.num_heads)
        return s + out.astype(jnp.float32).mean()

    f = jax.jit(step)
    t0 = time.perf_counter()
    s = f(params, jnp.float32(0), *zs)
    float(s)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = f(params, s, *zs)
    float(s)
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"stacked_mrt {args.model}@{args.width}x{args.height}: {dt:.1f} ms")


if __name__ == "__main__":
    main()
