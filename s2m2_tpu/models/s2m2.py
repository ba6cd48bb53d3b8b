"""S2M2 full forward pass (reference: src/s2m2/core/model/s2m2.py).

Pure function over a params pytree. Activations are NHWC; the left/right views
travel batch-concatenated ((2B, H, W, C), left half first) through the shared
feature trunk exactly as in the reference.

Inputs are images in [0, 255], (B, H, W, 3), H and W multiples of 32.
Outputs (disp, occ, conf), each (B, H, W, 1) at input resolution.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .cost_volume import make_cost_volume
from .encoder import cnn_encoder
from .feature_fusion import feature_fusion
from .matching import disp_init
from .mrt import stacked_mrt
from .refiners import global_refiner, local_refiner
from .packing import depth_to_space
from .unet import unet
from .upsampling import (upsample1x, upsample1x_multi, upsample4x_packed,
                         upsample_mask_1x_packed, upsample_mask_4x_packed)


def normalize_img(img):
    """[0,255] -> [-1,1] (reference: s2m2.py:80-89)."""
    return (img / 255.0 - 0.5) * 2.0


def forward(params, img0, img1, cfg: ModelConfig, return_aux: bool = False):
    """img0/img1: (B, H, W, 3) in [0,255], H%32 == W%32 == 0.

    return_aux=True (training only) additionally returns an aux dict with
    the per-refine-iteration disparity sequence at 1/4 resolution
    ('disp_seq', each (B, H/4, W/4, 1), in FULL-RES pixel units i.e. x4, OT
    init first) for RAFT-style exponentially-weighted sequence supervision
    (train/loss.py::sequence_loss) — the standard recipe for ConvGRU
    refiners; the reference ships no training code (README.md:38)."""
    img0_nor = normalize_img(img0)
    img1_nor = normalize_img(img1)

    # CNN feature extraction on the batch-concatenated pair
    feature_4x, feature_2x = cnn_encoder(
        params["cnn_backbone"], jnp.concatenate([img0_nor, img1_nor], axis=0))
    feature0_2x = jnp.split(feature_2x, 2, axis=0)[0]

    # feature pyramid U-Net (PE'd global attention at the 1/32 bottleneck)
    py_4x, py_8x, py_16x, py_32x = unet(
        params["feat_pyramid"], feature_4x,
        n_attn=cfg.num_transformer * 2, use_pe=True, pe_dim=cfg.pe_dim)

    # stacked multi-resolution transformer
    feature_tr_4x = stacked_mrt(
        params["transformer"], py_4x, py_8x, py_16x, py_32x,
        num_transformer=cfg.num_transformer, num_heads=cfg.num_heads)

    # OT matching -> initial disparity/conf/occ at 1/4 res
    disp, conf, occ, cv = disp_init(
        params["disp_init"], feature_tr_4x,
        ot_iter=cfg.ot_iter, use_positivity=cfg.use_positivity)

    feature0_tr_4x, _ = jnp.split(feature_tr_4x, 2, axis=0)
    feature0_py_4x, _ = jnp.split(py_4x, 2, axis=0)

    # global refinement (confidence-gated inpainting)
    disp = global_refiner(params["global_refiner"], feature0_tr_4x, disp, conf)
    if cfg.use_positivity:
        disp = jnp.maximum(disp, 0)

    # iterative local refinement
    feature0_fusion_4x = feature_fusion(
        params["feat_fusion_layer"], feature0_tr_4x, feature0_py_4x)
    ctx0 = layers.conv2d(params["ctx_feat"]["0"], feature0_fusion_4x)
    ctx0 = layers.conv2d(params["ctx_feat"]["2"], layers.gelu(ctx0))
    hidden = jnp.tanh(ctx0)

    w4 = feature0_fusion_4x.shape[2]
    cv_state = make_cost_volume(cv, radius=cfg.radius)
    coords_4x = jnp.arange(w4, dtype=jnp.float32).reshape(1, 1, w4, 1)

    disp_seq = [disp * 4]  # global-refined init, full-res px units
    for _ in range(cfg.refine_iter):
        hidden, disp, conf, occ = local_refiner(
            params["refiner"], hidden, ctx0, disp, conf, occ, cv_state)
        if cfg.use_positivity:
            disp = jnp.maximum(disp, 0)
        # geometric occlusion mask: matched coordinate must stay on-image
        occ_mask = (coords_4x - disp) >= 0
        occ = occ * occ_mask
        disp_seq.append(disp * 4)

    # 4x convex upsampling — mask heads and the convex combination run at
    # half res in the phase-major packed layout (see upsampling.py docstring)
    mask_p = upsample_mask_4x_packed(
        params["upsample_mask_4x_refine"], hidden, feature0_2x)
    ups = upsample4x_packed([disp * 4, occ, conf], mask_p)  # (B,Hp,Wp,4,3)

    # edge-guided 1x sharpening (the mask head runs in the compute dtype;
    # the disp/occ/conf maps themselves stay fp32 through the combination)
    filter_p = upsample_mask_1x_packed(
        params["upsample_mask_1x"], ups[..., 0].astype(img0_nor.dtype),
        img0_nor, feature0_2x)
    b, hp, wp = ups.shape[:3]
    full = depth_to_space(ups.reshape(b, hp, wp, 12))       # (B,H,W,3)
    filt = depth_to_space(filter_p.reshape(b, hp, wp, 36))  # (B,H,W,9)
    if cfg.output_upsample:
        disp_up = 2 * upsample1x(full[..., 0:1], filt, True)
        occ_up = upsample1x(full[..., 1:2], filt, True)
        conf_up = upsample1x(full[..., 2:3], filt, True)
    else:
        out = upsample1x_multi(full, filt)
        disp_up = out[..., 0:1]
        occ_up = out[..., 1:2]
        conf_up = out[..., 2:3]

    if return_aux:
        return disp_up, occ_up, conf_up, {"disp_seq": disp_seq}
    return disp_up, occ_up, conf_up
