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
    (reference: refinenet.py:39-73).

    Precision: the 1-channel disp/conf state is carried in fp32 through the
    whole refinement chain (negligible traffic) so bf16 drift does not scale
    with disparity magnitude; only the conv/UNet features run in the engine
    compute dtype. (Deliberate deviation from the reference's fp16 state
    carry, reference: refinenet.py:149-152 — see tests/test_model_parity.py
    bf16-drift bound.)"""
    disp = disp.astype(jnp.float32)
    conf = conf.astype(jnp.float32)
    disp_nor = disp / 1e2
    mask = (conf > 0.2).astype(jnp.float32)
    conf_logit = layers.logit(mask * conf, eps=1e-1)

    feat = jnp.concatenate(
        [(disp_nor * mask).astype(ctx.dtype), conf_logit.astype(ctx.dtype),
         ctx], axis=-1)
    feat = layers.conv2d(p["init_feat"]["0"], feat)
    feat = layers.conv2d(p["init_feat"]["2"], layers.gelu(feat))
    refine_feat = unet(p["refine_unet"], feat, n_attn=1, use_pe=False)[0]
    disp_update = layers.conv2d(p["out_feat"]["0"], refine_feat)
    disp_update = disp_update.astype(jnp.float32) * 1e2
    return mask * disp + (1 - mask) * disp_update


def local_refiner(p, hidden, ctx, disp, conf, occ, cv_state):
    """One RAFT-style update step (reference: refinenet.py:76-154).

    Returns (hidden, disp, conf, occ) at 1/4 resolution. disp/conf/occ are
    carried in fp32 (1-channel state — negligible traffic; keeps bf16 drift
    from scaling with disparity magnitude); hidden and all conv features run
    in the engine compute dtype.
    """
    cdt = ctx.dtype
    disp = disp.astype(jnp.float32)
    conf_logit = layers.logit(conf.astype(jnp.float32), eps=1e-2)
    occ_logit = layers.logit(occ.astype(jnp.float32), eps=1e-2)

    corr1, corr2 = cost_volume_lookup(cv_state, disp)

    def mlp2(pp, x, k_act=layers.gelu):
        y = layers.conv2d(pp["0"], x)
        return layers.conv2d(pp["2"], k_act(y))

    corr_feat1 = mlp2(p["corr_feat1"], corr1.astype(cdt) / 16)
    corr_feat2 = mlp2(p["corr_feat2"], corr2.astype(cdt) / 16)
    disp_feat = mlp2(p["disp_feat"], (disp / 1e2).astype(cdt))
    conf_feat = mlp2(p["conf_occ_feat"],
                     jnp.concatenate([conf_logit, occ_logit], axis=-1).astype(cdt))
    cat = jnp.concatenate(
        [disp_feat, corr_feat1, corr_feat2, ctx, conf_feat], axis=-1)
    feat = mlp2(p["disp_corr_ctx_cat"], cat.astype(cdt))

    refine_feat = unet(p["refine_unet"], feat, n_attn=1, use_pe=False)[0]
    hidden_new = conv_gru(p["gru"], hidden, refine_feat)
    disp_update = mlp2(p["disp_update"], hidden_new)
    conf_occ = mlp2(p["conf_occ_update"], hidden_new)
    conf_update, occ_update = jnp.split(conf_occ, 2, axis=-1)

    conf_new = layers.sigmoid(conf_update.astype(jnp.float32) + conf_logit)
    occ_new = layers.sigmoid(occ_update.astype(jnp.float32) + occ_logit)
    disp_new = disp + disp_update.astype(jnp.float32)
    return hidden_new.astype(cdt), disp_new, conf_new, occ_new
