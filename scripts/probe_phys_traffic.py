"""Physical (layout-padded) vs logical HBM traffic, per stage (dev tool).

Round-4 finding: the measured stage times that sit far above their
logical-bytes bandwidth rooflines (refine 99 vs 43 ms, encoder 44 vs 18,
upsampling 38 vs ~10) are explained almost entirely by PHYSICAL traffic —
layout-padded buffer bytes at fusion boundaries (XLA's batch-1 conv
retiling places 8-deep dims second-minor, padding 2x at bf16) plus layout
copies and standalone dtype converts. This walks each stage's compiled
ENTRY computation (fusion internals excluded — they never touch HBM) and
prints logical vs physical GB and the corresponding rooflines.

Compile-only — never touches the TPU server. See probe_refine_hlo.py for
the single-stage instruction-level breakdown.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from probe_refine_hlo import parse_entry  # noqa: E402
from s2m2_tpu.config import get_config
from s2m2_tpu.models import quant
from s2m2_tpu.models.init import init_params

PEAK_BW = 819.0


def stage_list(cfg, params, H, W):
    from s2m2_tpu.models.encoder import cnn_encoder
    from s2m2_tpu.models.unet import unet
    from s2m2_tpu.models.mrt import stacked_mrt
    from s2m2_tpu.models.matching import disp_init
    from s2m2_tpu.models.cost_volume import make_cost_volume
    from s2m2_tpu.models.refiners import global_refiner, local_refiner
    from s2m2_tpu.models.s2m2 import forward

    c = cfg.ch
    h4, w4 = H // 4, W // 4
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    img = rnd(2, H, W, 3)
    zs = [rnd(2, h4, w4, c), rnd(2, h4 // 2, w4 // 2, c),
          rnd(2, h4 // 4, w4 // 4, 2 * c), rnd(2, h4 // 8, w4 // 8, 2 * c)]
    one = jnp.asarray(rng.uniform(0.1, 0.9, (1, h4, w4, 1)), jnp.float32)
    cv = rnd(1, h4, w4, w4)

    def one_refine(p, hidden, ctx, disp, conf, occ, cvv):
        state = make_cost_volume(cvv, radius=cfg.radius)
        return local_refiner(p, hidden, ctx, disp, conf, occ, state)

    fimg = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)
    return [
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
         (params["global_refiner"], rnd(1, h4, w4, c), one * 30, one)),
        ("local_refiner x1", one_refine,
         (params["refiner"], rnd(1, h4, w4, c), rnd(1, h4, w4, c), one * 30,
          one, one, cv)),
        ("FULL forward",
         lambda p, a, b: forward(p, a, b, cfg)[0],
         (params, fimg, fimg)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--int8", action="store_true",
                    help="trace the int8-quantized variant of each stage")
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    stages = stage_list(cfg, params, args.height, args.width)
    print(f"{args.model}@{args.width}x{args.height} "
          f"({'int8' if args.int8 else 'bf16'})")
    print(f"{'stage':18s} {'logical':>9s} {'physical':>9s} {'pad':>5s} "
          f"{'phys-roofline':>13s}")
    for name, fn, a in stages:
        if args.int8:
            def obs(*x, fn=fn):
                with quant.observe() as o:
                    out = fn(*x)
                return out, (jnp.stack(o) if o else jnp.zeros((0,)))
            spec0 = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), list(a))
            n = jax.eval_shape(obs, *spec0)[1].shape[0]
            scales = tuple([0.05] * int(n))
            fn = (lambda *x, fn=fn, scales=scales:
                  _quantized_call(fn, scales, x))
        spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            list(a))
        comp = jax.jit(fn).lower(*spec).compile()
        rows = parse_entry(comp.as_text())
        phys = sum(r[2] for r in rows)
        log = sum(r[3] for r in rows)
        print(f"{name:18s} {log/1e9:7.2f}GB {phys/1e9:7.2f}GB "
              f"{phys/max(log,1):4.2f}x {phys/1e9/PEAK_BW*1e3:10.1f} ms",
              flush=True)


def _quantized_call(fn, scales, x):
    with quant.quantized(scales):
        return fn(*x)


if __name__ == "__main__":
    main()
