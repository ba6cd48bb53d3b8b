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

import numpy as np
import jax.numpy as jnp


def custom_sinc(x):
    # The reference uses 3.1415, not pi (reference: core/model/utils.py:5-6).
    px = 3.1415 * x
    return np.where(np.abs(x) < 1e-6, np.ones_like(x), np.sin(px) / px)


def _axis_table(n: int, pe_dim: int):
    """Relative table T[n_q, n_k, pe_dim//2] for one spatial axis of length n.

    Built host-side in numpy: the table is a static constant per (n, pe_dim),
    so it constant-folds into the compiled graph and is safe to lru_cache
    (jnp here would leak tracers across jit traces)."""
    half = pe_dim // 2
    L = 2 * n + 1
    sig = 5.0 / pe_dim
    pos = np.tanh(np.linspace(-3.0, 3.0, L, dtype=np.float32))
    dim_t = np.linspace(-1.0, 1.0, half, dtype=np.float32)
    tab = custom_sinc((dim_t[None, :] - pos[:, None]) / sig).astype(np.float32)
    tab = tab / np.clip(np.linalg.norm(tab, axis=-1, keepdims=True), 1e-12, None)
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = q - k + n - 1  # in [0, 2n-2] subset of [0, L-1]
    return tab[rel]  # (n, n, half)


@functools.lru_cache(maxsize=32)
def _axis_table_cached(n: int, pe_dim: int):
    # cache the numpy constant only; conversion to a jax value happens at the
    # use site so no tracer/device array ever lives in the cache
    return _axis_table(n, pe_dim)


def pe_tables(h: int, w: int, pe_dim: int = 32):
    """Per-axis relative PE tables (TY: (h,h,d/2), TX: (w,w,d/2)), fp32."""
    return (jnp.asarray(_axis_table_cached(h, pe_dim)),
            jnp.asarray(_axis_table_cached(w, pe_dim)))


def pe_contract(attn, ty, tx, h: int, w: int):
    """Contract attention probs with the factorized relative PE.

    attn: (..., N, N) with N = h*w, row-major (y, x) token order.
    Returns pe_sum (..., N, pe_dim) equal to the reference's
    einsum('...nij,ijc->...nic', attn, pe) (reference: attentions.py:47).
    """
    lead = attn.shape[:-2]
    a = attn.reshape(*lead, h, w, h, w)
    # marginals/contractions accumulate in fp32 even when attn is stored
    # bf16 (see attention._softmax_scores) — N-term prob sums need it
    ax = jnp.sum(a, axis=-2, dtype=jnp.float32)  # (..., hq, wq, wk)
    ay = jnp.sum(a, axis=-1, dtype=jnp.float32)  # (..., hq, wq, hk)
    ps_x = jnp.einsum("...hqk,qkc->...hqc", ax, tx,
                      preferred_element_type=jnp.float32)
    ps_y = jnp.einsum("...qwk,qkc->...qwc", ay, ty,
                      preferred_element_type=jnp.float32)
    ps_x = ps_x.reshape(*lead, h * w, -1)
    ps_y = ps_y.reshape(*lead, h * w, -1)
    return (0.5 * jnp.concatenate([ps_x, ps_y], axis=-1)).astype(attn.dtype)
