"""Per-stage timing of the S2M2 forward on the real TPU (dev tool).

Each stage is jitted separately and timed with chained scalar dependencies
(see runtime/engine.py benchmark notes). Inputs for later stages are the
actual outputs of earlier ones, so shapes/dtypes are production-real.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
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
from s2m2_tpu.models.s2m2 import normalize_img
from s2m2_tpu.models.packing import depth_to_space
from s2m2_tpu.models.upsampling import (upsample1x_multi, upsample4x_packed,
                                        upsample_mask_1x_packed,
                                        upsample_mask_4x_packed)

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--model", default="XL")
_ap.add_argument("--width", type=int, default=1216)
_ap.add_argument("--height", type=int, default=1024)
_ap.add_argument("--precision", default="bf16", choices=["bf16", "int8"])
ARGS = _ap.parse_args()
MODEL = ARGS.model
W, H = ARGS.width, ARGS.height  # width x height (reference notation)


def maybe_quantize(fn, args):
    """--precision int8: re-trace the stage with static dummy scales (scale
    VALUES don't affect speed; site count from an abstract observe trace)."""
    if ARGS.precision != "int8":
        return fn
    from s2m2_tpu.models import quant

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


def timed(name, fn, *args, n=3):
    """Chained-scalar timing: each iteration gets a distinct scalar input that
    is mixed (x + s*0) into the first array argument, defeating the runtime's
    caching of repeated identical executions."""
    fn = maybe_quantize(fn, args)

    def step(s, *a):
        # true serialization: s is mixed into the first array input with a
        # non-foldable negligible term (s*1e-12), and the output folds back
        # into s — so iteration i+1 cannot start (or be cache-served) before
        # iteration i finished.
        first, rest = a[0], a[1:]
        eps = (s * 1e-12)
        perturbed = jax.tree.map(lambda x: x + eps.astype(x.dtype), first)
        out = fn(perturbed, *rest)
        leaf = jax.tree.leaves(out)[0]
        return out, s + leaf.astype(jnp.float32).mean()

    f = jax.jit(step)
    out, sv = f(jnp.float32(0), *args)
    float(sv)  # block_until_ready is unreliable on axon; host fetch syncs
    t0 = time.perf_counter()
    s = sv
    for i in range(n):
        out, s = f(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt * 1e3:8.1f} ms")
    return out, dt


def main():
    cfg = get_config(MODEL)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.bfloat16)

    total = 0.0
    img = jnp.concatenate([normalize_img(img0), normalize_img(img1)], axis=0)
    (f4, f2), dt = timed("cnn_encoder", lambda p, x: cnn_encoder(p, x),
                         params["cnn_backbone"], img)
    total += dt

    py, dt = timed("feat_pyramid(unet)",
                   lambda p, x: unet(p, x, n_attn=cfg.num_transformer * 2,
                                     use_pe=True), params["feat_pyramid"], f4)
    total += dt

    tr, dt = timed("stacked_mrt",
                   lambda p, a, b, c, d: stacked_mrt(
                       p, a, b, c, d, num_transformer=cfg.num_transformer,
                       num_heads=cfg.num_heads),
                   params["transformer"], *py)
    total += dt

    (disp, conf, occ, cv), dt = timed(
        "disp_init(OT)", lambda p, f: disp_init(p, f, ot_iter=3,
                                                use_positivity=True),
        params["disp_init"], tr)
    total += dt

    f0tr = jnp.split(tr, 2, axis=0)[0]
    f0py = jnp.split(py[0], 2, axis=0)[0]
    disp, dt = timed("global_refiner",
                     lambda p, c, d, cf: global_refiner(p, c, d, cf),
                     params["global_refiner"], f0tr, disp, conf)
    total += dt

    def fuse_ctx(p, a, b):
        fu = feature_fusion(p["feat_fusion_layer"], a, b)
        ctx = layers.conv2d(p["ctx_feat"]["0"], fu)
        ctx = layers.conv2d(p["ctx_feat"]["2"], layers.gelu(ctx))
        return ctx, jnp.tanh(ctx)
    (ctx0, hidden), dt = timed("ctx/fusion", fuse_ctx, params, f0tr, f0py)
    total += dt

    def one_refine(p, hidden, ctx, disp, conf, occ, cv):
        state = make_cost_volume(cv, radius=4)
        return local_refiner(p, hidden, ctx, disp, conf, occ, state)
    (hidden, disp, conf, occ), dt = timed(
        "local_refiner x1", one_refine, params["refiner"], hidden, ctx0,
        disp, conf, occ, cv)
    total += 3 * dt
    print(f"{'(x3 refine total)':24s} {3 * dt * 1e3:8.1f} ms")

    def ups(p, hidden, f2l, disp, occ, conf, img0n):
        # mirrors the packed tail of models/s2m2.forward
        m = upsample_mask_4x_packed(p["upsample_mask_4x_refine"], hidden, f2l)
        u = upsample4x_packed([disp * 4, occ, conf], m)
        fw = upsample_mask_1x_packed(p["upsample_mask_1x"],
                                     u[..., 0].astype(img0n.dtype),
                                     img0n, f2l)
        b, hp, wp = u.shape[:3]
        full = depth_to_space(u.reshape(b, hp, wp, 12))
        filt = depth_to_space(fw.reshape(b, hp, wp, 36))
        return upsample1x_multi(full, filt)
    f20 = jnp.split(f2, 2, axis=0)[0]
    _, dt = timed("upsampling", ups, params, hidden, f20, disp, occ, conf,
                  normalize_img(img0))
    total += dt

    print(f"{'TOTAL (sum)':24s} {total * 1e3:8.1f} ms  -> {1 / total:.2f} FPS")


if __name__ == "__main__":
    main()
