"""Optimal-transport disparity initialization
(reference: src/s2m2/core/model/submodules.py:147-243).

Per epipolar row: W x W left/right correlation -> log-space Sinkhorn with a
dustbin row/column -> windowed soft-argmax around the per-row argmax, yielding
(disparity, confidence, occlusion) at 1/4 resolution, plus the raw correlation
volume reused by the iterative refiner.

Sinkhorn runs in float32 (the reference's fp16 path survives thanks to
max-shifted logsumexp + the -1e4 mask; fp32 islands are the bf16-safe TPU
equivalent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from ..ops.sinkhorn import fused_correlation_ot

# Fused correlation+Sinkhorn Pallas path (ops/sinkhorn.py); off by default —
# enable after measuring end-to-end on the target chip (S2M2_FUSED_OT=1).
import os as _os
_USE_FUSED_OT = _os.environ.get("S2M2_FUSED_OT", "") == "1"


def set_use_fused_ot(enabled: bool):
    global _USE_FUSED_OT
    _USE_FUSED_OT = enabled


def _sinkhorn(attn, log_mu, log_nu, ot_iter):
    """attn: (B, H, W+1, W+1) log scores. 3 iterations by default."""
    v = log_nu - layers.logsumexp_stable(attn, axis=2)
    u = log_mu - layers.logsumexp_stable(attn + v[:, :, None, :], axis=3)
    for _ in range(ot_iter - 1):
        v = log_nu - layers.logsumexp_stable(attn + u[:, :, :, None], axis=2)
        u = log_mu - layers.logsumexp_stable(attn + v[:, :, None, :], axis=3)
    return attn + u[:, :, :, None] + v[:, :, None, :]


def optimal_transport(cv_masked, ot_iter):
    """Add dustbins, run Sinkhorn, recover probabilities scaled by 2W
    (reference: submodules.py:169-201). cv_masked: (B, H, W, W)."""
    b, h, w, _ = cv_masked.shape
    dtype = cv_masked.dtype
    attn = jnp.pad(cv_masked.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, 1), (0, 1)))
    marginal = jnp.concatenate(
        [jnp.ones((w,), jnp.float32), jnp.array([float(w)], jnp.float32)]
    ) / (2.0 * w)
    log_mu = jnp.log(marginal).reshape(1, 1, w + 1)
    log_nu = log_mu
    attn = _sinkhorn(attn, log_mu, log_nu, ot_iter)
    log_const = jnp.log(jnp.float32(2 * w))
    prob = jnp.exp(attn[:, :, :-1, :-1] + log_const)
    return prob.astype(dtype)


def disp_init(p, feature, *, ot_iter=3, use_positivity=True, window=2):
    """feature: (2B, H, W, C) — left half then right half on batch.

    Returns (disparity (B,H,W,1), conf (B,H,W,1), occ (B,H,W,1),
    cv (B,H,W,W)) — cv is the raw pre-OT correlation, reused by CostVolume.
    """
    w = feature.shape[2]
    dtype = feature.dtype
    x_grid = jnp.arange(w, dtype=jnp.float32)

    feat = layers.layer_norm(feature, p["layer_norm"])
    f0, f1 = jnp.split(feat, 2, axis=0)

    if _USE_FUSED_OT and jax.default_backend() not in ("cpu",):
        masked_prob, cv = fused_correlation_ot(
            f0, f1, ot_iter=ot_iter, use_positivity=use_positivity)
    else:
        cv = jnp.einsum("bhic,bhjc->bhij", f0, f1,
                        preferred_element_type=jnp.float32).astype(dtype)
        if use_positivity:
            # mask right-of-left correspondences (upper triangle, j > i)
            tri = jnp.triu(jnp.ones((w, w), bool), k=1)
        else:
            tri = jnp.zeros((w, w), bool)
        cv_masked = jnp.where(tri, jnp.asarray(-1e4, cv.dtype), cv)
        prob = optimal_transport(cv_masked, ot_iter)
        masked_prob = jnp.where(tri, jnp.zeros((), prob.dtype), prob)

    # windowed soft-argmax: +-window around the row-wise argmax
    # (reference: submodules.py:226-239). The reference gathers the 5
    # window taps (5 take_along_axis passes); on TPU we compute the same
    # sums as ONE masked reduction over the candidate axis — gather-free,
    # fused with the probability read (same reformulation class as the
    # cost-volume hat kernel):
    #   conf = sum_j p[j] * 1[|j - argmax| <= window]
    #   corr = sum_j p[j] * j * 1[|j - argmax| <= window]
    mp32 = masked_prob.astype(jnp.float32)
    ind = jnp.argmax(mp32, axis=3)[..., None]  # (B,H,W,1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
    in_window = (jnp.abs(j - ind) <= window).astype(jnp.float32)
    conf = jnp.sum(mp32 * in_window, axis=3, keepdims=True)
    corr = jnp.sum(mp32 * in_window * j.astype(jnp.float32),
                   axis=3, keepdims=True)
    eps = 1e-4
    corr = (corr + eps) / (conf + eps)
    disparity = x_grid.reshape(1, 1, w, 1) - corr
    # disp/conf/occ stay fp32: the 1-channel state is carried in fp32 through
    # the whole refinement chain (see refiners.py precision note)
    occ = masked_prob.astype(jnp.float32).sum(axis=3, keepdims=True)
    return disparity, conf, occ, cv
