"""Per-stage XLA cost analysis (FLOPs + HBM bytes) of the S2M2 forward
(dev tool; compile-only, uses the persistent cache — no execution)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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
from s2m2_tpu.models.feature_fusion import feature_fusion
from s2m2_tpu.models.s2m2 import normalize_img, forward
from s2m2_tpu.models.upsampling import (upsample1x, upsample4x,
                                        upsample_mask_1x, upsample_mask_4x)

MODEL = "XL"
W, H = 1216, 1024


def report(name, fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    tf = ca.get("flops", 0) / 1e12
    gb = ca.get("bytes accessed", 0) / 1e9
    # roofline on v5e: 197 TFLOP/s bf16, 819 GB/s HBM
    t_flop = tf / 197 * 1e3
    t_bw = gb / 819 * 1e3
    print(f"{name:24s} {tf:7.2f} TF {gb:8.1f} GB   roofline "
          f"flop {t_flop:6.1f} ms / bw {t_bw:6.1f} ms")
    out = jax.eval_shape(fn, *args)
    return out


def main():
    cfg = get_config(MODEL)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)

    report("FULL forward", lambda p, a, b: forward(p, a, b, cfg),
           params, img0, img1)

    img = jnp.concatenate([normalize_img(img0), normalize_img(img1)], axis=0)
    f4s, f2s = report("cnn_encoder", lambda p, x: cnn_encoder(p, x),
                      params["cnn_backbone"], img)
    f4 = jnp.zeros(f4s.shape, f4s.dtype)
    f2 = jnp.zeros(f2s.shape, f2s.dtype)

    pys = report("feat_pyramid(unet)",
                 lambda p, x: unet(p, x, n_attn=cfg.num_transformer * 2,
                                   use_pe=True), params["feat_pyramid"], f4)
    py = tuple(jnp.zeros(s.shape, s.dtype) for s in pys)

    trs = report("stacked_mrt",
                 lambda p, a, b, c, d: stacked_mrt(
                     p, a, b, c, d, num_transformer=cfg.num_transformer,
                     num_heads=cfg.num_heads),
                 params["transformer"], *py)
    tr = jnp.zeros(trs.shape, trs.dtype)

    outs = report("disp_init(OT)",
                  lambda p, f: disp_init(p, f, ot_iter=3, use_positivity=True),
                  params["disp_init"], tr)
    disp = jnp.zeros(outs[0].shape, outs[0].dtype)
    conf = jnp.zeros(outs[1].shape, outs[1].dtype)
    occ = jnp.zeros(outs[2].shape, outs[2].dtype)
    cv = jnp.zeros(outs[3].shape, outs[3].dtype)

    f0tr = jnp.split(tr, 2, axis=0)[0]
    f0py = jnp.split(py[0], 2, axis=0)[0]
    report("global_refiner",
           lambda p, c, d, cf: global_refiner(p, c, d, cf),
           params["global_refiner"], f0tr, disp, conf)

    def fuse_ctx(p, a, b):
        fu = feature_fusion(p["feat_fusion_layer"], a, b)
        ctx = layers.conv2d(p["ctx_feat"]["0"], fu)
        ctx = layers.conv2d(p["ctx_feat"]["2"], layers.gelu(ctx))
        return ctx, jnp.tanh(ctx)
    ctxs = report("ctx/fusion", fuse_ctx, params, f0tr, f0py)
    ctx0 = jnp.zeros(ctxs[0].shape, ctxs[0].dtype)
    hidden = jnp.zeros(ctxs[1].shape, ctxs[1].dtype)

    def one_refine(p, hidden, ctx, disp, conf, occ, cv):
        state = make_cost_volume(cv, radius=4)
        return local_refiner(p, hidden, ctx, disp, conf, occ, state)
    report("local_refiner x1", one_refine, params["refiner"], hidden, ctx0,
           disp, conf, occ, cv)

    def ups(p, hidden, f2l, disp, occ, conf, img0n):
        m = upsample_mask_4x(p["upsample_mask_4x_refine"], hidden, f2l)
        d = upsample4x(disp * 4, m)
        o = upsample4x(occ, m)
        c = upsample4x(conf, m)
        fw = upsample_mask_1x(p["upsample_mask_1x"], d, img0n, f2l)
        return upsample1x(d, fw), upsample1x(o, fw), upsample1x(c, fw)
    f20 = jnp.split(f2, 2, axis=0)[0]
    report("upsampling", ups, params, hidden, f20, disp, occ, conf,
           normalize_img(img0))


if __name__ == "__main__":
    main()
