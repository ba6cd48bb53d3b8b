"""Compile-only cost analysis of the int8 forward vs bf16 (dev tool).

Lowers the full model for the TPU backend WITHOUT executing (no remote
compile), printing XLA cost analysis and rooflines for both precisions.
v5e peaks: 197 TFLOP/s bf16, ~394 TOP/s int8, 819 GB/s HBM.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models import quant
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward

PEAK_BW = 819.0


def report(name, fn, args, peak_tf):
    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
    comp = jax.jit(fn).lower(*spec).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    tf = ca.get("flops", 0) / 1e12
    gb = ca.get("bytes accessed", 0) / 1e9
    print(f"{name:18s} {tf:7.2f} TF  {gb:8.2f} GB  "
          f"bw-roofline {gb / PEAK_BW * 1e3:7.1f} ms  "
          f"compute-roofline {tf / peak_tf * 1e3:7.1f} ms", flush=True)
    return comp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--skip-bf16", action="store_true")
    args = ap.parse_args()
    cfg = get_config(args.model)
    H, W = args.height, args.width
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)

    def fwd(p, a, b):
        return forward(p, a, b, cfg)[0]

    # count quant sites by abstract tracing
    def observer(p, a, b):
        with quant.observe() as obs:
            out = forward(p, a, b, cfg)
        return out, jnp.stack(obs)

    n_sites = jax.eval_shape(observer, params, img0, img1)[1].shape[0]
    print(f"{n_sites} quantized GEMM sites")
    scales = tuple([0.05] * n_sites)

    def fwd_q(p, a, b):
        with quant.quantized(scales):
            return forward(p, a, b, cfg)[0]

    if not args.skip_bf16:
        report("forward bf16", fwd, (params, img0, img1), 197.0)
    report("forward int8", fwd_q, (params, img0, img1), 394.0)


if __name__ == "__main__":
    main()
