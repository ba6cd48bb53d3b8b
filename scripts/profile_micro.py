"""Micro-benchmarks of suspect ops inside local_refiner and MRT (dev tool)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params, _Rng, _conv
from s2m2_tpu.models import layers
from s2m2_tpu.models.attention import basic_attn_block, sdpa
from s2m2_tpu.models.cost_volume import make_cost_volume, cost_volume_lookup
from s2m2_tpu.models.refiners import conv_gru
from s2m2_tpu.models.unet import unet

C = 384
B, H4, W4 = 1, 256, 304  # XL @ 1216x1024, 1/4 res


def timed(name, fn, *args, n=5):
    def step(s, *a):
        first, rest = a[0], a[1:]
        eps = (s * 1e-12)
        perturbed = jax.tree.map(lambda x: x + eps.astype(x.dtype), first)
        out = fn(perturbed, *rest)
        leaf = jax.tree.leaves(out)[0]
        return out, s + leaf.astype(jnp.float32).mean()

    f = jax.jit(step)
    out, sv = f(jnp.float32(0), *args)
    float(sv)
    t0 = time.perf_counter()
    s = sv
    for _ in range(n):
        out, s = f(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    cfg = get_config("XL")
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    params = jax.tree.map(lambda x: x.astype(bf), init_params(cfg, seed=0))

    # 1) cost-volume lookup (gathers)
    cv = jnp.asarray(rng.standard_normal((B, H4, W4, W4)), bf)
    disp = jnp.asarray(rng.uniform(0, 50, (B, H4, W4, 1)), bf)
    state = make_cost_volume(cv, radius=4)
    timed("cv_lookup (2-scale 9-tap)", lambda c, d: cost_volume_lookup(
        make_cost_volume(c, radius=4), d), cv, disp)

    # 2) refine_unet alone (dims [C, C, 2C], n_attn=1)
    x4 = jnp.asarray(rng.standard_normal((B, H4, W4, C)), bf)
    timed("refine_unet [C,C,2C]",
          lambda p, x: unet(p, x, n_attn=1, use_pe=False),
          params["refiner"]["refine_unet"], x4)

    # 3) ConvGRU alone
    timed("conv_gru", lambda p, h, x: conv_gru(p, h, x),
          params["refiner"]["gru"], x4, x4)

    # 4) one BasicAttnBlock at 4x (2 views batched: 2B)
    z4 = jnp.asarray(rng.standard_normal((2 * B, H4, W4, C)), bf)
    timed("basic_attn_block @4x",
          lambda p, z: basic_attn_block(p, z, 1),
          params["transformer"]["uformer_list"]["0"]["enc_attn0"], z4)

    # 5) raw scanline SDPA at 4x shapes (B*H seqs of len W, heads=1, d=C)
    q = jnp.asarray(rng.standard_normal((2 * B * H4, 1, W4, C)), bf)
    timed("raw sdpa (512,1,304,384)", lambda q: sdpa(q, q, q), q)

    # 6) one FFN-equivalent dense at 4x tokens
    w1 = jnp.asarray(rng.standard_normal((C, C)) * 0.05, bf)
    x_tok = jnp.asarray(rng.standard_normal((2 * B * H4 * W4, C)), bf)
    timed("dense 156k x 384 x 384", lambda x: x @ w1, x_tok)

    # 7) 3x3 conv C->C at 4x res
    prng = _Rng(0)
    pc = jax.tree.map(lambda x: x.astype(bf), _conv(prng, C, C, 3))
    x1 = jnp.asarray(rng.standard_normal((2 * B, H4, W4, C)), bf)
    timed("conv3x3 384->384 @4x (2B)", lambda x: layers.conv2d(pc, x), x1)

    # 8) layer_norm overhead at 4x tokens
    timed("layer_norm @4x tokens", lambda x: layers.layer_norm(x), x1)

    # 9) disp_feat-style small-channel conv (1 -> 96)
    p_small = jax.tree.map(lambda x: x.astype(bf), _conv(prng, 1, 96, 3))
    d1 = jnp.asarray(rng.standard_normal((B, H4, W4, 1)), bf)
    timed("conv3x3 1->96", lambda x: layers.conv2d(p_small, x), d1)


if __name__ == "__main__":
    main()
