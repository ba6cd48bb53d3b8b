"""4-scale conv U-Net with a global-attention bottleneck
(reference: src/s2m2/core/model/unet.py).

Used three ways in S2M2: as the feature pyramid over the 1/4 features
(use_pe=True, n_attn=2*NTR), and as the trunk of the global/local refiners
(use_pe=False, n_attn=1). Returns all four decoder scales.
"""
from __future__ import annotations

from . import layers
from .attention import conv_block_2d, global_attn_block
from .feature_fusion import feature_fusion
from .pe import pe_tables


def _down(p, z):
    """AvgPool2 + 1x1 conv (reference: unet.py:25-30)."""
    return layers.conv2d(p["1"], layers.avg_pool2d(z, 2))


def _up(p, z):
    """Bilinear x2 (align_corners=False) + 1x1 conv (reference: unet.py:32-37)."""
    return layers.conv2d(p["1"], layers.upsample2x_bilinear(z))


def unet(p, z, *, n_attn, use_pe, use_gate_fusion=True, pe_dim=32,
         bottleneck_heads=8):
    """z: (B, H, W, C) at the U-Net's top scale. Returns the 4 decoder scales
    (1x, 2x, 4x, 8x relative downsampling)."""
    pe = None
    if use_pe:
        h, w = z.shape[1] // 8, z.shape[2] // 8
        pe = pe_tables(h, w, pe_dim)

    # Encoder
    z0 = conv_block_2d(p["enc0"], z)
    z1 = _down(p["down_conv0"], z0)
    z1 = conv_block_2d(p["enc1"], z1)
    z2 = _down(p["down_conv1"], z1)
    z2 = conv_block_2d(p["enc2"], z2)
    z3 = _down(p["down_conv2"], z2)
    for i in range(n_attn):
        # enc3s blocks carry the relative PE; dec3s do not (reference: unet.py:46-63)
        z3 = global_attn_block(p["enc3s"][str(i)], z3, bottleneck_heads, pe=pe)
    for i in range(n_attn):
        z3 = global_attn_block(p["dec3s"][str(i)], z3, bottleneck_heads, pe=None)
    z3_new = z3

    # Decoder
    z2_new = _up(p["up_conv2"], z3_new)
    z2_new = feature_fusion(p["concat_conv2"], z2, z2_new, use_gate_fusion)
    z2_new = conv_block_2d(p["dec2"], z2_new)

    z1_new = _up(p["up_conv1"], z2_new)
    z1_new = feature_fusion(p["concat_conv1"], z1, z1_new, use_gate_fusion)
    z1_new = conv_block_2d(p["dec1"], z1_new)

    z0_new = _up(p["up_conv0"], z1_new)
    z0_new = feature_fusion(p["concat_conv0"], z0, z0_new, use_gate_fusion)
    z0_new = conv_block_2d(p["dec0"], z0_new)

    return z0_new, z1_new, z2_new, z3_new
