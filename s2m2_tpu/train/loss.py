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
