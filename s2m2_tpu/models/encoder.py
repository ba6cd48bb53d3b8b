"""Shallow CNN feature stem (reference: src/s2m2/core/model/submodules.py:63-93).

Outputs features at 1/2 (x_2x) and 1/4 (x_4x) resolution, NHWC.

TPU reformulation: the reference stem runs 1x1 3->16, 1x1 16->16 and a
5x5/s2 16->64 conv at FULL resolution — channel counts far below the TPU's
128-lane width, wasting ~90% of the MXU. We space-to-depth the input once
(2x2 pixels -> channels) and run exact weight-rearranged equivalents on the
half-res packed grid (see packing.py): the 1x1s become block-diagonal 1x1s
at 4x channels, the 5x5/s2 becomes a 3x3 at 64 input channels whose output
already lives on the half-res grid. Identical floats up to reassociation
(pinned by tests/test_packing.py and the golden fixtures).
"""
from __future__ import annotations

from . import layers
from .packing import (pack_pointwise, pack_pointwise_s2d, pack_strided_conv,
                      space_to_depth)
from .. import flags as _flags

# Fold space_to_depth into the stem's first conv as a 2x2/s2 strided conv
# on the raw input (packing.pack_pointwise_s2d): the packed intermediate
# and its 6D-reshape relayout never materialize. Exactness asserted in
# tests/test_packing.py. Measured e2e on v5e XL@1216x1024 int8 (same
# session as the 3.173 mh-4D row): 3.242 FPS (+2.2%) — DEFAULT ON.
# S2M2_S2D_IN_CONV=0 restores the materialized space_to_depth stem.
_flags.define_env_bool(
    "s2d_in_conv", "S2M2_S2D_IN_CONV", "1",
    doc="fold stem space_to_depth into the first conv's access pattern")


def set_s2d_in_conv(enabled: bool):
    _flags.set_flag("s2d_in_conv", enabled)


def cnn_encoder(p, x):
    """x: (B, H, W, 3) normalized images. Returns (x_4x, x_2x)."""
    if _flags.get("s2d_in_conv"):
        h = layers.conv2d(pack_pointwise_s2d(p["conv0"]["0"]), x,
                          stride=2, padding=0)
    else:
        xp = space_to_depth(x)  # (B, H/2, W/2, 12)
        h = layers.conv2d(pack_pointwise(p["conv0"]["0"]), xp)
    h = layers.conv2d(pack_pointwise(p["conv0"]["2"]), layers.gelu(h))

    # 5x5/s2 16->64 == 3x3 64->64 on the packed grid (output is half-res)
    d = layers.conv2d(pack_strided_conv(p["conv1_down"]["0"]), h)
    d = layers.conv2d(p["conv1_down"]["2"], layers.gelu(d))
    x_2x = layers.group_norm(p["norm1"], d, num_groups=8)

    r = layers.conv2d(p["conv2"]["0"], x_2x)
    r = layers.conv2d(p["conv2"]["2"], layers.gelu(r))
    x_2x = r + x_2x

    x_4x = layers.conv2d(p["conv2_down"]["0"], x_2x, stride=2)
    return x_4x, x_2x


def cnn_encoder_unpacked(p, x):
    """Direct translation of the reference stem (full-res small-channel
    convs). Kept as the numerics oracle for the packed path."""
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
