"""Supervised stereo losses (new scope — the reference ships no training code,
reference README.md:38 'Training pipeline (not included)').

Loss follows the standard practice for models with disparity + occlusion +
confidence heads:
  * masked L1 (or smooth-L1) on disparity over valid ground-truth pixels,
  * BCE on the occlusion head against ground-truth non-occlusion,
  * BCE on the confidence head against the *induced* target
    1[|disp_pred - disp_gt| < 4px] — matching the reference's stated
    semantics of the confidence output ('1 if disp error < 4px else 0',
    reference: model_utils.py:65).
"""
from __future__ import annotations

import jax.numpy as jnp


def _bce(pred, target, eps=1e-6):
    p = jnp.clip(pred.astype(jnp.float32), eps, 1 - eps)
    t = target.astype(jnp.float32)
    return -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))


def stereo_loss(disp, occ, conf, gt_disp, valid, gt_nonocc=None,
                conf_threshold=4.0, w_disp=1.0, w_occ=0.5, w_conf=0.5):
    """All inputs (B, H, W, 1); valid is a {0,1} mask of supervised pixels.

    Returns (total_loss, metrics dict). Occlusion supervision is skipped when
    gt_nonocc is None (sparse datasets often lack it).
    """
    valid = valid.astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1.0)

    err = jnp.abs(disp.astype(jnp.float32) - gt_disp.astype(jnp.float32))
    l_disp = (err * valid).sum() / n

    conf_target = (err < conf_threshold).astype(jnp.float32)
    l_conf = (_bce(conf, conf_target) * valid).sum() / n

    total = w_disp * l_disp + w_conf * l_conf
    metrics = {"loss_disp": l_disp, "loss_conf": l_conf, "epe": l_disp}
    if gt_nonocc is not None:
        l_occ = (_bce(occ, gt_nonocc) * valid).sum() / n
        total = total + w_occ * l_occ
        metrics["loss_occ"] = l_occ
    metrics["loss"] = total
    return total, metrics


def _downsample4(x):
    """(B, H, W, 1) -> (B, H/4, W/4, 1) average pool (GT to 1/4 grid)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 4, 4, w // 4, 4, c).mean(axis=(2, 4))


def sequence_loss(disp_seq, disp_final, occ, conf, gt_disp, valid,
                  gt_nonocc=None, gamma=0.8, **kw):
    """RAFT-style exponentially-weighted sequence supervision
    (Teed & Deng, RAFT, ECCV 2020 — the standard recipe for ConvGRU
    iterative refiners; the reference ships no training code).

    disp_seq: per-refine-iteration quarter-res disparities in full-res px
    units (forward(..., return_aux=True)['disp_seq'], OT/global init first).
    Each intermediate gets weight gamma^(N-i) against 4x-downsampled GT; the
    final full-res output carries the full stereo_loss (weight 1).
    """
    total, metrics = stereo_loss(disp_final, occ, conf, gt_disp, valid,
                                 gt_nonocc, **kw)
    gt_q = _downsample4(gt_disp.astype(jnp.float32))
    # a GT quarter-pixel is supervised only if all 16 source px were valid
    valid_q = (_downsample4(valid.astype(jnp.float32)) > 0.999).astype(
        jnp.float32)
    nq = jnp.maximum(valid_q.sum(), 1.0)
    n_seq = len(disp_seq)
    l_seq = 0.0
    for i, d in enumerate(disp_seq):
        w_i = gamma ** (n_seq - i)
        err = jnp.abs(d.astype(jnp.float32) - gt_q)
        l_seq = l_seq + w_i * (err * valid_q).sum() / nq
    total = total + l_seq
    metrics["loss_seq"] = l_seq
    metrics["loss"] = total
    return total, metrics
