"""Gated feature fusion (reference: src/s2m2/core/model/feature_fusion.py)."""
from __future__ import annotations

import jax.numpy as jnp

from . import layers


def feature_fusion(p, z0, z1, use_gate=True):
    """out = fusion(cat) + w*z0 + (1-w)*z1 with w = clamp(sigmoid(gate), .01, .99)."""
    z = jnp.concatenate([z0, z1], axis=-1)
    fused = layers.conv2d(p["feature_fusion"]["0"], z)
    fused = layers.conv2d(p["feature_fusion"]["2"], layers.gelu(fused))
    if not use_gate:
        return fused
    g = layers.conv2d(p["feature_gate"]["0"], z)
    g = layers.conv2d(p["feature_gate"]["2"], layers.gelu(g))
    w = jnp.clip(layers.sigmoid(g), 0.01, 0.99)
    return fused + w * z0 + (1.0 - w) * z1
