"""Global and local disparity refiners
(reference: src/s2m2/core/model/refinenet.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import layers
from .cost_volume import cost_volume_lookup
from .unet import unet


def conv_gru(p, h, x):
    """Separable 2-pass ConvGRU: kx1 gates then 1xk gates
    (reference: refinenet.py:7-36)."""
    def half(h, x, cz, cr, cq):
        hx = jnp.concatenate([h, x], axis=-1)
        z = layers.sigmoid(layers.conv2d(cz, hx))
        r = layers.sigmoid(layers.conv2d(cr, hx))
        q = jnp.tanh(layers.conv2d(cq, jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q

    h = half(h, x, p["convz1"], p["convr1"], p["convq1"])
    h = half(h, x, p["convz2"], p["convr2"], p["convq2"])
    return h.astype(x.dtype)


def global_refiner(p, ctx, disp, conf):
    """Confidence-gated inpainting of low-confidence regions
    (reference: refinenet.py:39-73)."""
    disp_nor = disp / 1e2
    mask = (conf > 0.2).astype(disp.dtype)
    conf_logit = layers.logit(mask * conf, eps=1e-1)

    feat = jnp.concatenate([disp_nor * mask, conf_logit, ctx], axis=-1)
    feat = layers.conv2d(p["init_feat"]["0"], feat.astype(disp.dtype))
    feat = layers.conv2d(p["init_feat"]["2"], layers.gelu(feat))
    refine_feat = unet(p["refine_unet"], feat, n_attn=1, use_pe=False)[0]
    disp_update = layers.conv2d(p["out_feat"]["0"], refine_feat) * 1e2
    return (mask * disp + (1 - mask) * disp_update).astype(disp.dtype)


def local_refiner(p, hidden, ctx, disp, conf, occ, cv_state):
    """One RAFT-style update step (reference: refinenet.py:76-154).

    Returns (hidden, disp, conf, occ), all (B, H, W, *) at 1/4 resolution.
    """
    conf_logit = layers.logit(conf, eps=1e-2)
    occ_logit = layers.logit(occ, eps=1e-2)

    corr1, corr2 = cost_volume_lookup(cv_state, disp)

    def mlp2(pp, x, k_act=layers.gelu):
        y = layers.conv2d(pp["0"], x)
        return layers.conv2d(pp["2"], k_act(y))

    corr_feat1 = mlp2(p["corr_feat1"], corr1 / 16)
    corr_feat2 = mlp2(p["corr_feat2"], corr2 / 16)
    disp_feat = mlp2(p["disp_feat"], disp / 1e2)
    conf_feat = mlp2(p["conf_occ_feat"],
                     jnp.concatenate([conf_logit, occ_logit], axis=-1).astype(disp.dtype))
    cat = jnp.concatenate(
        [disp_feat, corr_feat1, corr_feat2, ctx, conf_feat], axis=-1)
    feat = mlp2(p["disp_corr_ctx_cat"], cat.astype(disp.dtype))

    refine_feat = unet(p["refine_unet"], feat, n_attn=1, use_pe=False)[0]
    hidden_new = conv_gru(p["gru"], hidden, refine_feat)
    disp_update = mlp2(p["disp_update"], hidden_new)
    conf_occ = mlp2(p["conf_occ_update"], hidden_new)
    conf_update, occ_update = jnp.split(conf_occ, 2, axis=-1)

    conf_new = layers.sigmoid(conf_update + conf_logit).astype(disp.dtype)
    occ_new = layers.sigmoid(occ_update + occ_logit).astype(disp.dtype)
    disp_new = (disp + disp_update).astype(disp.dtype)
    return hidden_new.astype(disp.dtype), disp_new, conf_new, occ_new
