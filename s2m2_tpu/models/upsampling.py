"""Convex upsampling masks and the RAFT-style upsample ops
(reference: src/s2m2/core/model/submodules.py:96-145 and s2m2.py:101-133).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers


def upsample_mask_4x(p, feat_x, feat_y):
    """hidden state (1/4 res) + CNN 1/2-res features -> 9-channel convex
    combination weights at full res (reference: submodules.py:96-115)."""
    fx = layers.conv_transpose2d(p["conv_x"], feat_x, stride=2)
    fy = layers.conv2d(p["conv_y"], feat_y)
    z = jnp.concatenate([fx, fy], axis=-1)
    z = layers.conv2d(p["conv_concat"]["0"], z)
    z = layers.conv_transpose2d(p["conv_concat"]["2"], layers.relu(z), stride=2)
    return z  # (B, H, W, 9)


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


def upsample4x(x, up_weights):
    """Convex 4x upsample: 3x3 unfold, nearest x4, softmax-weighted sum
    (reference: s2m2.py:101-114). x: (B,h,w,1), up_weights: (B,4h,4w,9)."""
    x_unfold = layers.unfold9(x)                       # (B,h,w,9)
    x_unfold = layers.upsample_nearest(x_unfold, 4)    # (B,4h,4w,9)
    w = jax.nn.softmax(up_weights.astype(jnp.float32), axis=-1).astype(x.dtype)
    return jnp.sum(x_unfold * w, axis=-1, keepdims=True)


def upsample1x(disp, filter_weights, output_upsample=False):
    """Edge-guided 1x sharpening filter (reference: s2m2.py:116-133)."""
    disp_unfold = layers.unfold9(disp)                 # (B,H,W,9)
    if output_upsample:
        disp_unfold = layers.upsample_nearest(disp_unfold, 2)
        b, h, w, c = filter_weights.shape
        filter_weights = jax.image.resize(
            filter_weights, (b, 2 * h, 2 * w, c), method="bilinear")
    w = jax.nn.softmax(filter_weights.astype(jnp.float32), axis=-1).astype(disp.dtype)
    return jnp.sum(disp_unfold * w, axis=-1, keepdims=True)
