"""Sinc-kernel contextual relative positional encoding — factorized form.

The reference materializes a dense (H*W, H*W, 32) relative-PE table and
contracts it with the attention matrix (reference: core/model/utils.py:32-60,
attentions.py:42-48). At Middlebury full-res that table alone is gigabytes.

The table is separable by construction:
    pe[i, j, :] = 0.5 * concat( TX[x_i - x_j + W - 1], TY[y_i - y_j + H - 1] )
so the contraction  pe_sum[i] = sum_j attn[i, j] * pe[i, j]  splits into two
small per-axis contractions after marginalizing the attention over the other
axis. We therefore only ever build the (W, W, d/2) and (H, H, d/2) tables and
compute

    pe_sum_x[(yq,xq)] = sum_xk ( sum_yk attn[(yq,xq),(yk,xk)] ) * TX[xq - xk + W - 1]

which is exactly equal to the reference math (same floats up to reassociation)
at O(N * (H + W) * d) instead of O(N^2 * d) memory.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


def custom_sinc(x):
    # The reference uses 3.1415, not pi (reference: core/model/utils.py:5-6).
    px = 3.1415 * x
    return jnp.where(jnp.abs(x) < 1e-6, jnp.ones_like(x), jnp.sin(px) / px)


def _axis_table(n: int, pe_dim: int, dtype=jnp.float32):
    """Relative table T[n_q, n_k, pe_dim//2] for one spatial axis of length n."""
    half = pe_dim // 2
    L = 2 * n + 1
    sig = 5.0 / pe_dim
    pos = jnp.tanh(jnp.linspace(-3.0, 3.0, L, dtype=jnp.float32))
    dim_t = jnp.linspace(-1.0, 1.0, half, dtype=jnp.float32)
    tab = custom_sinc((dim_t[None, :] - pos[:, None]) / sig)  # (L, half)
    tab = tab / jnp.clip(jnp.linalg.norm(tab, axis=-1, keepdims=True), 1e-12)
    q = jnp.arange(n)[:, None]
    k = jnp.arange(n)[None, :]
    rel = q - k + n - 1  # in [0, 2n-2] subset of [0, L-1]
    return jnp.take(tab, rel, axis=0).astype(dtype)  # (n, n, half)


@functools.lru_cache(maxsize=32)
def _axis_table_cached(n: int, pe_dim: int):
    return _axis_table(n, pe_dim)


def pe_tables(h: int, w: int, pe_dim: int = 32):
    """Per-axis relative PE tables (TY: (h,h,d/2), TX: (w,w,d/2)), fp32."""
    return _axis_table_cached(h, pe_dim), _axis_table_cached(w, pe_dim)


def pe_contract(attn, ty, tx, h: int, w: int):
    """Contract attention probs with the factorized relative PE.

    attn: (..., N, N) with N = h*w, row-major (y, x) token order.
    Returns pe_sum (..., N, pe_dim) equal to the reference's
    einsum('...nij,ijc->...nic', attn, pe) (reference: attentions.py:47).
    """
    lead = attn.shape[:-2]
    a = attn.reshape(*lead, h, w, h, w)
    ax = jnp.sum(a, axis=-2)            # (..., hq, wq, wk): marginal over yk
    ay = jnp.sum(a, axis=-1)            # (..., hq, wq, hk): marginal over xk
    # contract xk against TX[xq, xk, c] and hk against TY[yq, hk, c]
    ps_x = jnp.einsum("...hqk,qkc->...hqc", ax, tx.astype(attn.dtype))
    ps_y = jnp.einsum("...qwk,qkc->...qwc", ay, ty.astype(attn.dtype))
    ps_x = ps_x.reshape(*lead, h * w, -1)
    ps_y = ps_y.reshape(*lead, h * w, -1)
    return 0.5 * jnp.concatenate([ps_x, ps_y], axis=-1)
