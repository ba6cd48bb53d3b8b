"""Pallas TPU kernels for S2M2's attention shapes.

Scanline (epipolar) attention is the model's dominant attention pattern:
every image row is an independent sequence (reference: attentions.py:99-161),
giving thousands of short sequences (seq = W/4 <= 608, head_dim up to 384).
LLM-tuned flash kernels are mistuned for this; instead each Pallas program
computes ONE row's full attention entirely in VMEM — a (N, D) q/k/v tile, an
(N, N) f32 score tile, softmax, and the PV matmul — so the f32 score matrix
never touches HBM. That halves HBM traffic vs the XLA path (which
materializes scores) and removes softmax kernel-launch round trips.

Numerics match attention.sdpa exactly: f32 QK^T accumulation, f32 softmax,
bf16 PV with f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only where TPU lowering is available
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _row_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[...]  # (G, N, D)
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _row_group(b, n, d, bytes_per_el=2, n_tiles=4, n_score=1,
               vmem_budget=11 * 2 ** 20):
    """Rows per grid step: amortize per-step overhead within a VMEM budget.
    Tiles are double-buffered by the pipeline; scores are scratch (single)."""
    per_row = 2 * n_tiles * n * d * bytes_per_el + n_score * n * n * 4
    g = max(1, vmem_budget // max(per_row, 1))
    while g > 1 and b % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def scanline_attention(q, k, v, interpret=False):
    """Row-batched attention: q, k, v (B, N, D) -> (B, N, D).

    B is (batch x heads x image-rows) folded together; each grid step runs a
    group of rows. Softmax is f32; inputs/outputs keep their dtype.
    """
    b, n, d = q.shape
    scale = d ** -0.5
    g = _row_group(b, n, d, q.dtype.itemsize, n_tiles=4, n_score=1)
    kernel = functools.partial(_row_attn_kernel, scale=scale)
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        **({"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _cross_row_attn_kernel(qx_ref, kx_ref, vx_ref, qy_ref, ky_ref, vy_ref,
                           ox_ref, oy_ref, *, scale):
    """Bidirectional cross-view attention for one row pair: x attends to y
    and y attends to x, sharing the loaded tiles (one pass over HBM)."""
    qx, kx, vx = qx_ref[...], kx_ref[...], vx_ref[...]
    qy, ky, vy = qy_ref[...], ky_ref[...], vy_ref[...]

    def one(qq, kk, vv):
        s = jax.lax.dot_general(qq, kk, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vv.dtype)
        return jax.lax.dot_general(p, vv, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    ox_ref[...] = one(qx, ky, vy).astype(ox_ref.dtype)
    oy_ref[...] = one(qy, kx, vx).astype(oy_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scanline_cross_attention(qx, kx, vx, qy, ky, vy, interpret=False):
    """Symmetric cross-view attention (reference: attentions.py:57-96) with
    both directions fused in one kernel: x_out = attn(qx, ky, vy),
    y_out = attn(qy, kx, vx). All six inputs (B, N, D)."""
    b, n, d = qx.shape
    scale = d ** -0.5
    g = _row_group(b, n, d, qx.dtype.itemsize, n_tiles=8, n_score=2)
    kernel = functools.partial(_cross_row_attn_kernel, scale=scale)
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        **({"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}))
    ox, oy = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[spec] * 6,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), qx.dtype)] * 2,
        interpret=interpret,
    )(qx, kx, vx, qy, ky, vy)
    return ox, oy
