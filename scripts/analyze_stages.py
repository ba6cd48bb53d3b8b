"""Compile-only per-stage cost analysis on the TPU target (dev tool).

Lowers+compiles each stage for the TPU backend WITHOUT executing (no
remote-compile round trip), then prints XLA cost analysis (TFLOP, GB) and
the bandwidth-roofline time at v5e's 819 GB/s. Use to find traffic fat
without paying the ~12 min first-execution cost of the tunneled runtime.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import re

import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models import layers
from s2m2_tpu.models.encoder import cnn_encoder
from s2m2_tpu.models.unet import unet
from s2m2_tpu.models.mrt import stacked_mrt
from s2m2_tpu.models.matching import disp_init
from s2m2_tpu.models.cost_volume import make_cost_volume
from s2m2_tpu.models.refiners import global_refiner, local_refiner
from s2m2_tpu.models.s2m2 import forward

PEAK_TF = 197.0
PEAK_BW = 819.0


def report(name, fn, *tree_args, top=0):
    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), list(tree_args))
    comp = jax.jit(fn).lower(*spec).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    tf = ca.get("flops", 0) / 1e12
    gb = ca.get("bytes accessed", 0) / 1e9
    print(f"{name:22s} {tf:7.2f} TF  {gb:8.2f} GB  "
          f"bw-roofline {gb / PEAK_BW * 1e3:7.1f} ms  "
          f"mxu-roofline {tf / PEAK_TF * 1e3:7.1f} ms", flush=True)
    if top:
        txt = comp.as_text()
        pat = re.compile(
            r"=\s+\(?((?:f32|bf16|f16|s32|pred|u32|u8|s8)\[[0-9,]*\])")
        dtb = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "pred": 1,
               "u32": 4, "u8": 1, "s8": 1}
        groups = collections.Counter()
        counts = collections.Counter()
        entry = txt[txt.index("ENTRY "):] if "ENTRY " in txt else txt
        for line in entry.splitlines()[1:]:
            ls = line.strip()
            m = pat.search(ls)
            if m is None or "parameter(" in ls or "constant" in ls:
                continue
            spec_s = m.group(1)
            dt = spec_s.split("[")[0]
            dims = spec_s[spec_s.index("[") + 1:spec_s.index("]")]
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            rhs = ls.split("=", 1)[1]
            toks = rhs.split("(")[0].strip().split()
            kind = toks[-1] if toks else "?"
            if kind == "fusion":
                km = re.search(r"kind=(\w+)", ls)
                kind = f"fusion:{km.group(1) if km else '?'}"
            groups[(kind, spec_s)] += n * dtb[dt]
            counts[(kind, spec_s)] += 1
        for (kind, spec_s), b in groups.most_common(top):
            print(f"    {b/1e9:7.2f} GB x{counts[(kind, spec_s)]:4d} "
                  f"{kind:20s} {spec_s}")
    return tf, gb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()
    cfg = get_config(args.model)
    W, H = args.width, args.height
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    c = cfg.ch
    h4, w4 = H // 4, W // 4
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    want = set(args.stages.split(","))

    def on(name):
        return args.stages == "all" or name in want

    img = rnd(2, H, W, 3)
    if on("encoder"):
        report("cnn_encoder", cnn_encoder, params["cnn_backbone"], img,
               top=args.top)
    f4 = rnd(2, h4, w4, c)
    if on("unet"):
        report("feat_pyramid",
               lambda p, x: unet(p, x, n_attn=cfg.num_transformer * 2,
                                 use_pe=True),
               params["feat_pyramid"], f4, top=args.top)
    zs = [rnd(2, h4, w4, c), rnd(2, h4 // 2, w4 // 2, c),
          rnd(2, h4 // 4, w4 // 4, 2 * c), rnd(2, h4 // 8, w4 // 8, 2 * c)]
    if on("mrt"):
        report("stacked_mrt",
               lambda p, a, b, cc, d: stacked_mrt(
                   p, a, b, cc, d, num_transformer=cfg.num_transformer,
                   num_heads=cfg.num_heads),
               params["transformer"], *zs, top=args.top)
    if on("disp_init"):
        report("disp_init", lambda p, f: disp_init(p, f, ot_iter=3,
                                                   use_positivity=True),
               params["disp_init"], zs[0], top=args.top)
    one = rnd(1, h4, w4, 1)
    cv = rnd(1, h4, w4, w4)
    if on("global_refiner"):
        report("global_refiner", global_refiner,
               params["global_refiner"], rnd(1, h4, w4, c), one, one,
               top=args.top)
    if on("refine"):
        def one_refine(p, hidden, ctx, disp, conf, occ, cvv):
            state = make_cost_volume(cvv, radius=4)
            return local_refiner(p, hidden, ctx, disp, conf, occ, state)
        report("local_refiner x1", one_refine, params["refiner"],
               rnd(1, h4, w4, c), rnd(1, h4, w4, c), one,
               jnp.abs(one), jnp.abs(one), cv, top=args.top)
    if on("forward"):
        report("FULL forward",
               lambda p, a, b: forward(p, a, b, cfg),
               params, rnd(1, H, W, 3) * 100 + 120, rnd(1, H, W, 3) * 100 + 120,
               top=args.top)


if __name__ == "__main__":
    main()
