"""Multi-Resolution Transformer and its stack
(reference: src/s2m2/core/model/stacked_MRT.py).

U-shaped attention encoder/decoder over the 4 pyramid scales. Scales 1x/2x/4x
(relative) run scanline (epipolar) attention; the 8x bottleneck runs 2x2 2D
global attention with cross-view attention. Head counts scale 1/2/4/8 times
the base head count.
"""
from __future__ import annotations

import jax

from . import layers
from .attention import basic_attn_block, global_attn_block
from .feature_fusion import feature_fusion
from ..ops.fused_block import fused_basic_attn_block

# Fused scanline block (ops/fused_block.py). Toggle via S2M2_FUSED_BLOCK=1
# or set_use_fused_block(True); see README perf notes for measurements.
from .. import flags as _flags

_flags.define_env_bool(
    "fused_block", "S2M2_FUSED_BLOCK", "0",
    doc="Pallas fused BasicAttnBlock (measured -4% counter-example)")
_FUSED_MAX_C = 512


def set_use_fused_block(enabled: bool):
    _flags.set_flag("fused_block", enabled)


def _scanline_block(p, z, num_heads):
    c = z.shape[-1]
    e = p["cross_attn"]["attn"]["q"]["weight"].shape[1]
    if (_flags.get("fused_block") and c <= _FUSED_MAX_C and e <= _FUSED_MAX_C
            and jax.default_backend() not in ("cpu",)):
        return fused_basic_attn_block(p, z, num_heads=num_heads)
    return basic_attn_block(p, z, num_heads)


def _down(p, z):
    return layers.conv2d(p["1"], layers.avg_pool2d(z, 2))


def _up(p, z):
    return layers.conv2d(p["1"], layers.upsample2x_bilinear(z))


def mrt(p, z0, z1, z2, z3, *, num_heads=1, use_gate_fusion=True):
    """One MRT pass over the four scales (reference: stacked_MRT.py:89-133)."""
    # Encoder
    z0 = _scanline_block(p["enc_attn0"], z0, 1 * num_heads)
    z1 = feature_fusion(p["down_concat1"], z1, _down(p["down_conv0"], z0),
                        use_gate_fusion)
    z1 = _scanline_block(p["enc_attn1"], z1, 2 * num_heads)
    z2 = feature_fusion(p["down_concat2"], z2, _down(p["down_conv1"], z1),
                        use_gate_fusion)
    z2 = _scanline_block(p["enc_attn2"], z2, 4 * num_heads)
    z3 = feature_fusion(p["down_concat3"], z3, _down(p["down_conv2"], z2),
                        use_gate_fusion)
    for i in range(2):
        z3 = global_attn_block(p["enc_attn3s"][str(i)], z3, 8 * num_heads,
                               use_cross_attn=True)
    # Decoder
    for i in range(2):
        z3 = global_attn_block(p["dec_attn3s"][str(i)], z3, 8 * num_heads,
                               use_cross_attn=True)
    z2 = feature_fusion(p["up_concat2"], z2, _up(p["up_conv2"], z3),
                        use_gate_fusion)
    z2 = _scanline_block(p["dec_attn2"], z2, 4 * num_heads)
    z1 = feature_fusion(p["up_concat1"], z1, _up(p["up_conv1"], z2),
                        use_gate_fusion)
    z1 = _scanline_block(p["dec_attn1"], z1, 2 * num_heads)
    z0 = feature_fusion(p["up_concat0"], z0, _up(p["up_conv0"], z1),
                        use_gate_fusion)
    z0 = _scanline_block(p["dec_attn0"], z0, 1 * num_heads)
    return z0, z1, z2, z3


def stacked_mrt(p, z0, z1, z2, z3, *, num_transformer, num_heads=1,
                use_gate_fusion=True):
    """NTR-times repeated MRT; only the top (1/4) scale is consumed downstream
    (reference: stacked_MRT.py:156-166)."""
    for i in range(num_transformer):
        z0, z1, z2, z3 = mrt(p["uformer_list"][str(i)], z0, z1, z2, z3,
                             num_heads=num_heads,
                             use_gate_fusion=use_gate_fusion)
    return z0
