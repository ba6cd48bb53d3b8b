"""Convex upsampling masks and the RAFT-style upsample ops
(reference: src/s2m2/core/model/submodules.py:96-145 and s2m2.py:101-133).

TPU reformulation: both mask heads run tiny-channel convs at (or into) full
resolution — far below the TPU's 128 channel lanes. The packed variants
(`*_packed`) run exact weight-rearranged equivalents on the half-res
phase-major packed grid (see packing.py): stride-2 2x2 transposed convs
become 1x1 convs emitting packed channels, full-res 3x3 convs become packed
3x3 convs at 4x channels, and the final 9-channel mask stays packed
(B, H/2, W/2, 4, 9) so the softmax and the convex combinations also run at
half resolution. The unpacked originals are kept as numerics oracles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .packing import (concat_packed, depth_to_space, pack_conv_s1,
                      pack_convT2x2, pack_convT3x3, pack_pointwise,
                      space_to_depth)
from .. import flags as _flags

# Convex-combination contractions as broadcast-multiply+reduce instead of
# dot_general. A dot's operands must MATERIALIZE, and these operands carry a
# 9-sized axis that XLA places minor (128-lane pad = 14x): the round-4
# census charges the f32 softmax outputs + the nearest-upsampled unfold
# ~5.4 GB of physical copies. A multiply+reduce fuses producer-to-consumer
# on the VPU (no materialized padded operands); additionally the nearest x2
# inside upsample4x_packed becomes a RESHAPE OF THE WEIGHTS (index identity
# (2i+a)//2 == i), so the upsampled unfold tensor never exists. This is NOT
# the recorded round-3 tap-accumulation counter-example (+33 GB): that
# unrolled 9 sequential accumulation steps; this is a single fused reduce.
# MEASURED COUNTER-EXAMPLE (round 5): census +2.0 GB reads+writes (315.3 vs
# 313.3 — XLA materializes the broadcast-product reduce operands padded
# anyway) and e2e 3.194 vs 3.242 FPS (-1.5%) on XL@1216x1024 int8 —
# default OFF; the einsum contraction stays. The ~5.4 GB f32 9-minor family
# is priced and closed: both reformulation directions (tap unroll r3, fused
# reduce r5) lose to the materialized-dot-operand form.
_flags.define_env_bool(
    "up_reduce", "S2M2_UP_REDUCE", "0",
    doc="convex upsampling as fused multiply+reduce (measured -1.5%)")


def set_up_reduce(enabled: bool):
    _flags.set_flag("up_reduce", enabled)


# bf16 STORAGE for the convex-combination softmax weights (statistics stay
# fp32 — same invariant as attention's bf16_scores). The (B,H,W,9) f32
# weights pad 14x on the lane axis; bf16 halves that family. The x maps
# themselves (disp/occ/conf state) stay fp32; the contraction accumulates
# fp32 via preferred_element_type. Census (round 5): -1.0 GB reads+writes
# (276.8 vs 277.8 on XL int8) ≈ +0.3% predicted — BELOW the ±1.5%
# measurement noise band, so the flag ships OFF and unmeasured (an e2e row
# could not distinguish it from noise); drift bounded in test_packing.
_flags.define_env_bool(
    "up_bf16_w", "S2M2_UP_BF16_W", "0",
    doc="bf16 storage for convex-upsampling softmax weights (opt-in)")


def set_up_bf16_w(enabled: bool):
    _flags.set_flag("up_bf16_w", enabled)


def _softmax_w(w, out_dtype):
    """fp32-statistics softmax; storage dtype per the up_bf16_w flag."""
    store = (jnp.bfloat16 if _flags.get("up_bf16_w") else out_dtype)
    return jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(store)


def upsample_mask_4x(p, feat_x, feat_y):
    """hidden state (1/4 res) + CNN 1/2-res features -> 9-channel convex
    combination weights at full res (reference: submodules.py:96-115)."""
    fx = layers.conv_transpose2d(p["conv_x"], feat_x, stride=2)
    fy = layers.conv2d(p["conv_y"], feat_y)
    z = jnp.concatenate([fx, fy], axis=-1)
    z = layers.conv2d(p["conv_concat"]["0"], z)
    z = layers.conv_transpose2d(p["conv_concat"]["2"], layers.relu(z), stride=2)
    return z  # (B, H, W, 9)


def upsample_mask_4x_packed(p, feat_x, feat_y):
    """Packed-output variant: returns (B, H/2, W/2, 4, 9) phase-major.

    The convT(k2,s2) C->64 becomes a 1x1 C->256 at 1/4 + depth-to-space;
    the final convT(k2,s2) 128->9 becomes a 1x1 128->36 that stays packed.
    """
    fx = depth_to_space(layers.conv2d(pack_convT2x2(p["conv_x"]), feat_x))
    fy = layers.conv2d(p["conv_y"], feat_y)
    z = jnp.concatenate([fx, fy], axis=-1)
    z = layers.conv2d(p["conv_concat"]["0"], z)
    z = layers.conv2d(pack_convT2x2(p["conv_concat"]["2"]), layers.relu(z))
    b, hp, wp, _ = z.shape
    return z.reshape(b, hp, wp, 4, 9)


def upsample_mask_1x(p, disp, rgb, ctx):
    """disp + normalized RGB + 1/2-res features -> 9-channel edge-guided
    filter weights at full res (reference: submodules.py:118-145)."""
    fd = layers.relu(layers.conv_transpose2d(p["conv_disp"]["0"], disp, padding=1))
    fr = layers.relu(layers.conv_transpose2d(p["conv_rgb"]["0"], rgb, padding=1))
    fc = layers.conv_transpose2d(p["conv_ctx"], ctx, stride=2)
    z = jnp.concatenate([fd, fr, fc], axis=-1)
    z = layers.conv2d(p["conv_concat"]["0"], z)
    z = layers.conv_transpose2d(p["conv_concat"]["2"], layers.relu(z))
    return z  # (B, H, W, 9)


def upsample_mask_1x_packed(p, disp_packed, rgb, ctx):
    """Packed variant: all convs run at half res on packed channels.

    disp_packed: (B, H/2, W/2, 4) phase-major full-res disparity.
    rgb: (B, H, W, 3) normalized image (space-to-depth'd here).
    ctx: (B, H/2, W/2, C) half-res features.
    Returns (B, H/2, W/2, 4, 9) phase-major filter weights.
    """
    fd = layers.relu(
        layers.conv2d(pack_convT3x3(p["conv_disp"]["0"]), disp_packed))
    fr = layers.relu(
        layers.conv2d(pack_convT3x3(p["conv_rgb"]["0"]), space_to_depth(rgb)))
    fc = layers.conv2d(pack_convT2x2(p["conv_ctx"]), ctx)
    z = concat_packed([fd, fr, fc], [16, 16, 16])
    z = layers.conv2d(pack_conv_s1(p["conv_concat"]["0"]), z)
    z = layers.conv2d(pack_pointwise(p["conv_concat"]["2"]), layers.relu(z))
    b, hp, wp, _ = z.shape
    return z.reshape(b, hp, wp, 4, 9)


def upsample4x(x, up_weights):
    """Convex 4x upsample: 3x3 unfold, nearest x4, softmax-weighted sum
    (reference: s2m2.py:101-114). x: (B,h,w,1), up_weights: (B,4h,4w,9)."""
    x_unfold = layers.unfold9(x)                       # (B,h,w,9)
    x_unfold = layers.upsample_nearest(x_unfold, 4)    # (B,4h,4w,9)
    w = _softmax_w(up_weights, x.dtype)
    return jnp.sum(x_unfold * w.astype(x.dtype), axis=-1, keepdims=True)


def upsample4x_packed(xs, up_weights_packed):
    """Convex 4x upsample of several 1-channel maps with a shared packed
    mask, staying at half res.

    Exactness: the full-res pixel (2p+a, 2q+b) draws from the 1/4-res
    neighborhood at index ((2p+a)//4, (2q+b)//4) == (p//2, q//2) for all
    phases, so a nearest x2 (not x4) of the unfolded taps suffices.

    Measured counter-example (round 3): rewriting this einsum (and
    upsample1x/_multi) as 9 tap-accumulation steps to avoid materializing
    the unfold tensor INCREASED XLA cost-analysis traffic by ~33 GB on
    S@1216x1024 — the fp32 accumulator round-trips HBM at every step and
    XLA does not fuse the chain; the einsum contraction stays.

    xs: list of (B, h, w, 1) quarter-res maps.
    up_weights_packed: (B, 2h, 2w, 4, 9).
    Returns (B, 2h, 2w, 4, len(xs)) phase-major packed full-res outputs.
    """
    x = jnp.concatenate(xs, axis=-1)                   # (B,h,w,C)
    c = x.shape[-1]
    b, h, w, _ = x.shape
    xu = layers.unfold9(x).reshape(b, h, w, 9, c)      # tap-major
    wgt = _softmax_w(up_weights_packed, x.dtype)       # (B,2h,2w,4,9)
    if _flags.get("up_reduce"):
        # nearest x2 == indexing the quarter-res neighborhood at p//2: the
        # (b,2h,2w,4,9) weights reshape (row-major split, bitcastable) to
        # (b,h,2,w,2,4,9) and contract against the UN-upsampled unfold —
        # the (B,2h,2w,9,C) tensor never materializes
        w6 = wgt.reshape(b, h, 2, w, 2, 4, 9)
        out = jnp.sum(xu[:, :, None, :, None, None, :, :]
                      * w6[..., None], axis=-2)        # (b,h,2,w,2,4,c)
        return out.reshape(b, 2 * h, 2 * w, 4, c)
    xu = layers.upsample_nearest(xu, 2)                # (B,2h,2w,9,C)
    return jnp.einsum("bpqtc,bpqft->bpqfc", xu, wgt,
                      preferred_element_type=x.dtype)


def upsample1x(disp, filter_weights, output_upsample=False):
    """Edge-guided 1x sharpening filter (reference: s2m2.py:116-133)."""
    disp_unfold = layers.unfold9(disp)                 # (B,H,W,9)
    if output_upsample:
        disp_unfold = layers.upsample_nearest(disp_unfold, 2)
        b, h, w, c = filter_weights.shape
        filter_weights = jax.image.resize(
            filter_weights, (b, 2 * h, 2 * w, c), method="bilinear")
    w = _softmax_w(filter_weights, disp.dtype)
    return jnp.sum(disp_unfold * w.astype(disp.dtype), axis=-1,
                   keepdims=True)


def upsample1x_multi(x, filter_weights):
    """Edge-guided filter applied to C maps with one shared softmax.

    x: (B, H, W, C) full-res maps; filter_weights: (B, H, W, 9).
    Returns (B, H, W, C).
    """
    b, h, w, c = x.shape
    xu = layers.unfold9(x).reshape(b, h, w, 9, c)
    wgt = _softmax_w(filter_weights, x.dtype)
    if _flags.get("up_reduce"):
        return jnp.sum(xu * wgt[..., :, None].astype(x.dtype), axis=-2)
    return jnp.einsum("bhwtc,bhwt->bhwc", xu, wgt,
                      preferred_element_type=x.dtype)
