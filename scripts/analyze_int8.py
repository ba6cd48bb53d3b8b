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


def quantized_variant(fn, args):
    """Wrap `fn` so it traces with dummy static scales (site count taken
    from an abstract observe trace) — structure-exact int8 lowering."""
    def obs(*a):
        with quant.observe() as o:
            out = fn(*a)
        return out, (jnp.stack(o) if o else jnp.zeros((0,), jnp.float32))

    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        list(args))
    n = jax.eval_shape(obs, *spec)[1].shape[0]
    scales = tuple([0.05] * int(n))

    def fq(*a):
        with quant.quantized(scales):
            return fn(*a)

    return fq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="per-stage bf16-vs-int8 cost analysis")
    args = ap.parse_args()
    if args.stages:
        return stages_main(args)
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


def stages_main(args):
    from s2m2_tpu.models.encoder import cnn_encoder
    from s2m2_tpu.models.unet import unet
    from s2m2_tpu.models.mrt import stacked_mrt
    from s2m2_tpu.models.matching import disp_init
    from s2m2_tpu.models.cost_volume import make_cost_volume
    from s2m2_tpu.models.refiners import global_refiner, local_refiner

    cfg = get_config(args.model)
    H, W = args.height, args.width
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    c = cfg.ch
    h4, w4 = H // 4, W // 4
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    img = rnd(2, H, W, 3)
    zs = [rnd(2, h4, w4, c), rnd(2, h4 // 2, w4 // 2, c),
          rnd(2, h4 // 4, w4 // 4, 2 * c), rnd(2, h4 // 8, w4 // 8, 2 * c)]
    one = rnd(1, h4, w4, 1)
    cv = rnd(1, h4, w4, w4)

    def one_refine(p, hidden, ctx, disp, conf, occ, cvv):
        state = make_cost_volume(cvv, radius=4)
        return local_refiner(p, hidden, ctx, disp, conf, occ, state)

    stages = [
        ("cnn_encoder", cnn_encoder, (params["cnn_backbone"], img)),
        ("feat_pyramid",
         lambda p, x: unet(p, x, n_attn=cfg.num_transformer * 2, use_pe=True),
         (params["feat_pyramid"], zs[0])),
        ("stacked_mrt",
         lambda p, a, b, cc, d: stacked_mrt(
             p, a, b, cc, d, num_transformer=cfg.num_transformer,
             num_heads=cfg.num_heads),
         (params["transformer"], *zs)),
        ("disp_init",
         lambda p, f: disp_init(p, f, ot_iter=3, use_positivity=True),
         (params["disp_init"], zs[0])),
        ("global_refiner", global_refiner,
         (params["global_refiner"], rnd(1, h4, w4, c), one, one)),
        ("local_refiner x1", one_refine,
         (params["refiner"], rnd(1, h4, w4, c), rnd(1, h4, w4, c), one,
          jnp.abs(one), jnp.abs(one), cv)),
    ]
    for name, fn, a in stages:
        report(f"{name} bf16", fn, a, 197.0)
        report(f"{name} int8", quantized_variant(fn, a), a, 394.0)


if __name__ == "__main__":
    main()
