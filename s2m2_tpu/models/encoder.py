"""Shallow CNN feature stem (reference: src/s2m2/core/model/submodules.py:63-93).

Outputs features at 1/2 (x_2x) and 1/4 (x_4x) resolution, NHWC.
"""
from __future__ import annotations

from . import layers


def cnn_encoder(p, x):
    """x: (B, H, W, 3) normalized images. Returns (x_4x, x_2x)."""
    h = layers.conv2d(p["conv0"]["0"], x)
    h = layers.conv2d(p["conv0"]["2"], layers.gelu(h))

    d = layers.conv2d(p["conv1_down"]["0"], h, stride=2)
    d = layers.conv2d(p["conv1_down"]["2"], layers.gelu(d))
    x_2x = layers.group_norm(p["norm1"], d, num_groups=8)

    r = layers.conv2d(p["conv2"]["0"], x_2x)
    r = layers.conv2d(p["conv2"]["2"], layers.gelu(r))
    x_2x = r + x_2x

    x_4x = layers.conv2d(p["conv2_down"]["0"], x_2x, stride=2)
    return x_4x, x_2x
