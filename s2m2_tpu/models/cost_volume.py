"""Cost-volume lookup for iterative refinement
(reference: src/s2m2/core/model/submodules.py:19-60).

The reference samples a (B*H, 1, W, W) correlation image with
F.grid_sample(align_corners=True). Since the y coordinate is always the exact
integer row, bilinear sampling degenerates to 1D linear interpolation along the
candidate axis — so the TPU-native formulation is a per-element gather +
fused linear weights along the last axis (no 2D grid_sample needed).

9 taps (radius 4) at two scales: the full-resolution volume and a width-halved
average-pooled copy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp1d_hat(vol, pos):
    """Gather-free 1D linear interpolation of vol (..., W2) at positions pos
    (..., T) with zeros out-of-range (grid_sample zero-padding semantics:
    each neighbor tap is zeroed independently outside [0, W2-1]).

    Linear interpolation with zero padding is exactly a hat-kernel weighted
    reduction:  out[.., t] = sum_j vol[.., j] * max(0, 1 - |pos_t - j|)
    (the two nonzero hat taps are the (1-a)/a bilinear weights, and
    out-of-range positions contribute nothing). Expressed as a broadcast +
    reduce, XLA fuses the weight generation into the reduction loop — no
    (..., T, W2) tensor is materialized and no gather is emitted. On TPU this
    is ~40x faster than take_along_axis at production shapes (v5e: 47 ms ->
    ~1 ms for the two-scale 9-tap lookup at XL 1216x1024).
    """
    w2 = vol.shape[-1]
    pos = pos.astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1, w2), 4)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - j))
    return jnp.sum(vol[..., None, :].astype(jnp.float32) * w,
                   axis=-1).astype(vol.dtype)


def make_cost_volume(cv, radius=4):
    """cv: (B, H, W, W2) raw correlation. Returns (cv, cv_2x, dx) state."""
    b, h, w, w2 = cv.shape
    cv_2x = cv.reshape(b, h, w, w2 // 2, 2).mean(axis=-1)
    dx = jnp.linspace(-radius, radius, 2 * radius + 1, dtype=jnp.float32)
    return cv, cv_2x, dx


def cost_volume_lookup(state, disp):
    """disp: (B, H, W, 1). Returns two (B, H, W, 2r+1) correlation feature
    maps (full-scale and half-scale lookups)."""
    cv, cv_2x, dx = state
    b, h, w, _ = disp.shape
    coords = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1)
    d = disp.astype(jnp.float32)
    pos1 = coords - d + dx.reshape(1, 1, 1, -1)          # (B,H,W,9)
    pos2 = coords / 2.0 - d / 2.0 + dx.reshape(1, 1, 1, -1)
    corrs = _interp1d_hat(cv, pos1)
    corrs_2x = _interp1d_hat(cv_2x, pos2)
    return corrs, corrs_2x
