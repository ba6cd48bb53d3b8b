"""Parameter-tree construction for S2M2.

The params pytree is a nested dict whose keys mirror the reference's torch
module paths (reference: src/s2m2/core/model/s2m2.py:13-67) — e.g.
params['cnn_backbone']['conv0']['0']['weight'] corresponds to the torch
state-dict key 'cnn_backbone.conv0.0.weight' — so converted checkpoints map
1:1 (see tools/convert_checkpoint.py). Layouts are JAX-native:

  conv weight:            (kh, kw, in, out)    [HWIO]
  conv-transpose weight:  (kh, kw, in, out)    (torch (in,out,kh,kw) reordered)
  linear weight:          (in, out)
  norm weight/bias:       (C,)

Random init approximates torch defaults (uniform +-1/sqrt(fan_in)); exact init
parity is irrelevant because production paths load converted checkpoints.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig


class _Rng:
    def __init__(self, seed):
        self.g = np.random.default_rng(seed)

    def uniform(self, shape, bound, dtype):
        return jnp.asarray(
            self.g.uniform(-bound, bound, size=shape).astype(np.float32),
            dtype=dtype)


def _conv(rng, cin, cout, k, bias=True, dtype=jnp.float32):
    kh, kw = (k, k) if isinstance(k, int) else k
    fan_in = cin * kh * kw
    b = 1.0 / np.sqrt(fan_in)
    p = {"weight": rng.uniform((kh, kw, cin, cout), b, dtype)}
    if bias:
        p["bias"] = rng.uniform((cout,), b, dtype)
    return p


def _convT(rng, cin, cout, k, bias=True, dtype=jnp.float32):
    # same storage layout as _conv; conv_transpose2d() handles semantics
    return _conv(rng, cin, cout, k, bias, dtype)


def _linear(rng, cin, cout, bias=True, dtype=jnp.float32):
    b = 1.0 / np.sqrt(cin)
    p = {"weight": rng.uniform((cin, cout), b, dtype)}
    if bias:
        p["bias"] = rng.uniform((cout,), b, dtype)
    return p


def _norm(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _self_attn(rng, d, heads, e, use_pe, pe_dim=32, dtype=jnp.float32):
    p = {
        "q": _linear(rng, d, e * d, bias=False, dtype=dtype),
        "k": _linear(rng, d, e * d, bias=False, dtype=dtype),
        "v": _linear(rng, d, e * d, bias=True, dtype=dtype),
        "proj": _linear(rng, e * d, d, bias=False, dtype=dtype),
    }
    if use_pe:
        p["pe_proj"] = _linear(rng, pe_dim, e * d // heads, dtype=dtype)
    return p


def _cross_attn(rng, d, e, dtype=jnp.float32):
    return {
        "q": _linear(rng, d, e * d, bias=False, dtype=dtype),
        "k": _linear(rng, d, e * d, bias=False, dtype=dtype),
        "v": _linear(rng, d, e * d, bias=True, dtype=dtype),
        "proj": _linear(rng, e * d, d, bias=False, dtype=dtype),
    }


def _ffn(rng, d, e, dtype=jnp.float32):
    return {"ffn": {"0": _linear(rng, d, e * d, dtype=dtype),
                    "2": _linear(rng, e * d, d, dtype=dtype)}}


def _conv_block2d(rng, d, e, k=3, dtype=jnp.float32):
    return {"convs": {"0": _conv(rng, d, e * d, k, dtype=dtype),
                      "2": _conv(rng, e * d, d, k, dtype=dtype)},
            "convs_1x": {"0": _conv(rng, d, e * d, 1, dtype=dtype),
                         "2": _conv(rng, e * d, d, 1, dtype=dtype)}}


def _feature_fusion(rng, d, k, use_gate=True, dtype=jnp.float32):
    p = {"feature_fusion": {"0": _conv(rng, 2 * d, 2 * d, k, dtype=dtype),
                            "2": _conv(rng, 2 * d, d, 1, dtype=dtype)}}
    if use_gate:
        p["feature_gate"] = {"0": _conv(rng, 2 * d, d, k, dtype=dtype),
                             "2": _conv(rng, d, d, 1, dtype=dtype)}
    return p


def _global_attn_block(rng, d, heads, e, use_cross, use_pe, dtype=jnp.float32):
    p = {"self_attn": {"attn": _self_attn(rng, d, heads, e, use_pe, dtype=dtype)},
         "ffn": _ffn(rng, d, e, dtype=dtype)}
    if use_cross:
        p["cross_attn"] = {"attn": _cross_attn(rng, d, e, dtype=dtype)}
        p["ffn_c"] = _ffn(rng, d, e, dtype=dtype)
    return p


def _basic_attn_block(rng, d, heads, e, dtype=jnp.float32):
    return {"cross_attn": {"attn": _cross_attn(rng, d, e, dtype=dtype)},
            "self_attn": {"attn": _self_attn(rng, d, heads, e, False, dtype=dtype)},
            "ffn_c": _ffn(rng, d, e, dtype=dtype),
            "ffn": _ffn(rng, d, e, dtype=dtype)}


def _unet(rng, dims, e, use_pe, n_attn, use_gate=True, dtype=jnp.float32):
    d0, d1, d2 = dims
    p = {
        "down_conv0": {"1": _conv(rng, d0, d1, 1, dtype=dtype)},
        "down_conv1": {"1": _conv(rng, d1, d2, 1, dtype=dtype)},
        "down_conv2": {"1": _conv(rng, d2, d2, 1, dtype=dtype)},
        "up_conv0": {"1": _conv(rng, d1, d0, 1, dtype=dtype)},
        "up_conv1": {"1": _conv(rng, d2, d1, 1, dtype=dtype)},
        "up_conv2": {"1": _conv(rng, d2, d2, 1, dtype=dtype)},
        "concat_conv0": _feature_fusion(rng, d0, 1, use_gate, dtype),
        "concat_conv1": _feature_fusion(rng, d1, 1, use_gate, dtype),
        "concat_conv2": _feature_fusion(rng, d2, 1, use_gate, dtype),
        "enc0": _conv_block2d(rng, d0, e, dtype=dtype),
        "enc1": _conv_block2d(rng, d1, e, dtype=dtype),
        "enc2": _conv_block2d(rng, d2, e, dtype=dtype),
        "dec0": _conv_block2d(rng, d0, e, dtype=dtype),
        "dec1": _conv_block2d(rng, d1, e, dtype=dtype),
        "dec2": _conv_block2d(rng, d2, e, dtype=dtype),
        "enc3s": {str(i): _global_attn_block(rng, d2, 8, e, False, use_pe, dtype)
                  for i in range(n_attn)},
        "dec3s": {str(i): _global_attn_block(rng, d2, 8, e, False, False, dtype)
                  for i in range(n_attn)},
    }
    return p


def _mrt(rng, dims, heads, e, use_gate=True, dtype=jnp.float32):
    d0, d1, d2 = dims
    return {
        "down_conv0": {"1": _conv(rng, d0, d1, 1, dtype=dtype)},
        "down_conv1": {"1": _conv(rng, d1, d2, 1, dtype=dtype)},
        "down_conv2": {"1": _conv(rng, d2, d2, 1, dtype=dtype)},
        "up_conv0": {"1": _conv(rng, d1, d0, 1, dtype=dtype)},
        "up_conv1": {"1": _conv(rng, d2, d1, 1, dtype=dtype)},
        "up_conv2": {"1": _conv(rng, d2, d2, 1, dtype=dtype)},
        "down_concat1": _feature_fusion(rng, d1, 1, use_gate, dtype),
        "down_concat2": _feature_fusion(rng, d2, 1, use_gate, dtype),
        "down_concat3": _feature_fusion(rng, d2, 1, use_gate, dtype),
        "up_concat0": _feature_fusion(rng, d0, 1, use_gate, dtype),
        "up_concat1": _feature_fusion(rng, d1, 1, use_gate, dtype),
        "up_concat2": _feature_fusion(rng, d2, 1, use_gate, dtype),
        "enc_attn0": _basic_attn_block(rng, d0, 1 * heads, e, dtype),
        "enc_attn1": _basic_attn_block(rng, d1, 2 * heads, e, dtype),
        "enc_attn2": _basic_attn_block(rng, d2, 4 * heads, e, dtype),
        "enc_attn3s": {str(i): _global_attn_block(rng, d2, 8 * heads, e, True, False, dtype)
                       for i in range(2)},
        "dec_attn0": _basic_attn_block(rng, d0, 1 * heads, e, dtype),
        "dec_attn1": _basic_attn_block(rng, d1, 2 * heads, e, dtype),
        "dec_attn2": _basic_attn_block(rng, d2, 4 * heads, e, dtype),
        "dec_attn3s": {str(i): _global_attn_block(rng, d2, 8 * heads, e, True, False, dtype)
                       for i in range(2)},
    }


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32):
    """Build the full S2M2 parameter tree."""
    rng = _Rng(seed)
    c = cfg.feature_channels
    e = cfg.dim_expansion
    dims = list(cfg.unet_dims)

    params = {
        "cnn_backbone": {
            "conv0": {"0": _conv(rng, 3, 16, 1, dtype=dtype),
                      "2": _conv(rng, 16, 16, 1, dtype=dtype)},
            "conv1_down": {"0": _conv(rng, 16, 64, 5, dtype=dtype),
                           "2": _conv(rng, 64, c, 3, dtype=dtype)},
            "norm1": _norm(c, dtype),
            "conv2": {"0": _conv(rng, c, c, 3, dtype=dtype),
                      "2": _conv(rng, c, c, 3, dtype=dtype)},
            "conv2_down": {"0": _conv(rng, c, c, 3, dtype=dtype)},
        },
        "feat_pyramid": _unet(rng, dims, e, True, cfg.num_transformer * 2,
                              True, dtype),
        "transformer": {"uformer_list": {
            str(i): _mrt(rng, dims, cfg.num_heads, e, True, dtype)
            for i in range(cfg.num_transformer)}},
        "disp_init": {"layer_norm": _norm(c, dtype)},
        "upsample_mask_1x": {
            "conv_disp": {"0": _convT(rng, 1, 16, 3, dtype=dtype)},
            "conv_rgb": {"0": _convT(rng, 3, 16, 3, dtype=dtype)},
            "conv_ctx": _convT(rng, c, 16, 2, dtype=dtype),
            "conv_concat": {"0": _conv(rng, 48, 48, 3, dtype=dtype),
                            "2": _convT(rng, 48, 9, 1, dtype=dtype)},
        },
        "upsample_mask_4x_refine": {
            "conv_x": _convT(rng, c, 64, 2, dtype=dtype),
            "conv_y": _conv(rng, c, 64, 3, dtype=dtype),
            "conv_concat": {"0": _conv(rng, 128, 128, 3, dtype=dtype),
                            "2": _convT(rng, 128, 9, 2, dtype=dtype)},
        },
        "global_refiner": {
            "init_feat": {"0": _conv(rng, 2 + c, c, 3, dtype=dtype),
                          "2": _conv(rng, c, c, 1, dtype=dtype)},
            "refine_unet": _unet(rng, [c, c, c], 1, False, 1, True, dtype),
            "out_feat": {"0": _conv(rng, c, 1, 3, dtype=dtype)},
        },
        "feat_fusion_layer": _feature_fusion(rng, c, 3, True, dtype),
        "refiner": {
            "disp_feat": {"0": _conv(rng, 1, 96, 3, dtype=dtype),
                          "2": _conv(rng, 96, 96, 3, dtype=dtype)},
            "corr_feat1": {"0": _conv(rng, 2 * cfg.radius + 1, 96, 1, dtype=dtype),
                           "2": _conv(rng, 96, 64, 1, dtype=dtype)},
            "corr_feat2": {"0": _conv(rng, 2 * cfg.radius + 1, 96, 1, dtype=dtype),
                           "2": _conv(rng, 96, 64, 1, dtype=dtype)},
            "conf_occ_feat": {"0": _conv(rng, 2, 64, 3, dtype=dtype),
                              "2": _conv(rng, 64, 32, 1, dtype=dtype)},
            "disp_corr_ctx_cat": {"0": _conv(rng, 256 + c, 2 * c, 1, dtype=dtype),
                                  "2": _conv(rng, 2 * c, c, 3, dtype=dtype)},
            "refine_unet": _unet(rng, dims, e, False, 1, True, dtype),
            "disp_update": {"0": _conv(rng, c, c, 3, dtype=dtype),
                            "2": _conv(rng, c, 1, 3, bias=False, dtype=dtype)},
            "conf_occ_update": {"0": _conv(rng, c, c, 3, dtype=dtype),
                                "2": _conv(rng, c, 2, 3, bias=False, dtype=dtype)},
            "gru": {
                "convz1": _conv(rng, 2 * c, c, (3, 1), dtype=dtype),
                "convr1": _conv(rng, 2 * c, c, (3, 1), dtype=dtype),
                "convq1": _conv(rng, 2 * c, c, (3, 1), dtype=dtype),
                "convz2": _conv(rng, 2 * c, c, (1, 3), dtype=dtype),
                "convr2": _conv(rng, 2 * c, c, (1, 3), dtype=dtype),
                "convq2": _conv(rng, 2 * c, c, (1, 3), dtype=dtype),
            },
        },
        "ctx_feat": {"0": _conv(rng, c, c, 1, dtype=dtype),
                     "2": _conv(rng, c, c, 1, dtype=dtype)},
    }
    return params


def param_count(params) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
