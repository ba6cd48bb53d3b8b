"""Fused per-row correlation + masking + Sinkhorn kernel (SURVEY.md §7.5c).

The OT matcher runs 3 Sinkhorn iterations (7 logsumexp sweeps) over per-row
(W+1)x(W+1) log-score matrices (reference: submodules.py:169-201). The XLA
path streams the full (B, H, W+1, W+1) f32 tensor through HBM once per sweep;
this kernel computes the correlation matmul, positivity mask, dustbin
padding, all Sinkhorn sweeps and the probability recovery for a group of rows
entirely in VMEM — one read of the features, one write of the probabilities.

Matches models.matching exactly: f32 throughout the OT, -1e4 masking,
max-shifted clamped logsumexp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _lse(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    y = jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True)
    return m + jnp.log(jnp.clip(y, 1e-30, None))


def _kernel(f0_ref, f1_ref, cv_ref, prob_ref, *, ot_iter, use_positivity,
            w):
    f0 = f0_ref[...]  # (G, W, C)
    f1 = f1_ref[...]
    cv = jax.lax.dot_general(f0, f1, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    cv_ref[...] = cv.astype(cv_ref.dtype)

    i = jax.lax.broadcasted_iota(jnp.int32, (1, w, w), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, w, w), 2)
    if use_positivity:
        cv = jnp.where(j > i, jnp.float32(-1e4), cv)

    # dustbin row+column of zeros (reference pads with 0 log-score)
    attn = jnp.pad(cv, ((0, 0), (0, 1), (0, 1)))

    # uniform marginals: log(1/(2W)) for pixels, log(W/(2W)) for the dustbin
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w + 1), 2)
    log_nu = jnp.where(idx == w, jnp.log(w / (2.0 * w)),
                       -jnp.log(2.0 * w)).astype(jnp.float32)  # (1,1,W+1)
    log_mu = jnp.moveaxis(log_nu, 2, 1)                        # (1,W+1,1)

    # reference sweep order (submodules.py:169-181): v over rows (axis 1),
    # u over columns (axis 2)
    v = log_nu - _lse(attn, axis=1)
    u = log_mu - _lse(attn + v, axis=2)
    for _ in range(ot_iter - 1):
        v = log_nu - _lse(attn + u, axis=1)
        u = log_mu - _lse(attn + v, axis=2)
    out = attn + u + v
    prob = jnp.exp(out[:, :w, :w] + jnp.log(2.0 * w))
    if use_positivity:
        prob = jnp.where(j > i, 0.0, prob)
    prob_ref[...] = prob.astype(prob_ref.dtype)


def _row_group(bh, w, c, itemsize, vmem_budget=10 * 2 ** 20):
    per_row = 2 * 2 * w * c * itemsize + 5 * (w + 1) * (w + 1) * 4
    g = max(1, vmem_budget // max(per_row, 1))
    g = min(g, bh)
    while g > 1 and bh % g:
        g -= 1
    return g


@functools.partial(jax.jit,
                   static_argnames=("ot_iter", "use_positivity", "interpret"))
def fused_correlation_ot(f0, f1, ot_iter=3, use_positivity=True,
                         interpret=False):
    """f0, f1: (B, H, W, C) normalized features (left/right views).

    Returns (prob, cv): the masked transport probabilities (B, H, W, W) and
    the raw correlation volume (both in f0.dtype), matching
    models.matching.disp_init's internals.
    """
    b, h, w, c = f0.shape
    x = f0.reshape(b * h, w, c)
    y = f1.reshape(b * h, w, c)
    g = _row_group(b * h, w, c, f0.dtype.itemsize)
    mem = ({"memory_space": pltpu.VMEM}
           if _HAS_PLTPU and not interpret else {})
    in_spec = pl.BlockSpec((g, w, c), lambda i: (i, 0, 0), **mem)
    out_spec = pl.BlockSpec((g, w, w), lambda i: (i, 0, 0), **mem)
    cv, prob = pl.pallas_call(
        functools.partial(_kernel, ot_iter=ot_iter,
                          use_positivity=use_positivity, w=w),
        grid=(b * h // g,),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b * h, w, w), f0.dtype)] * 2,
        interpret=interpret,
    )(x, y)
    return (prob.reshape(b, h, w, w), cv.reshape(b, h, w, w))
