"""Fused scanline BasicAttnBlock kernel.

One Pallas program applies the ENTIRE reference BasicAttnBlock
(cross-attention + FFN + self-attention + FFN with pre-norms and residuals,
reference: attentions.py:324-355) to a group of epipolar row pairs while the
activations stay resident in VMEM. The XLA path round-trips every sublayer's
activations through HBM (~15 passes of the (2B,H,W,C) tensor per block); the
fused kernel reads the rows once and writes them once, with the weight
matrices (constant block index) fetched a single time by the Mosaic pipeline.

Restriction: the full weight set (12 CxC matrices at dim_expansion=1) must
fit VMEM alongside the row tiles, so this engages at C <= 512 — the 1x/2x
MRT scales where most scanline-attention time is spent; the C=2*ch scales
fall back to the unfused path.

Numerics match models.attention.basic_attn_block: fp32 layer norms and
softmax, residuals in the compute dtype.
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

# weight order passed to the kernel (e = dim_expansion * C):
# cross: q (C,e), k (C,e), v (C,e), v_b (1,e), proj (e,C)
# ffn_c: w1 (C,e), b1 (1,e), w2 (e,C), b2 (1,C)
# self:  q, k, v, v_b, proj
# ffn:   w1, b1, w2, b2
N_WEIGHTS = 18


def _erf(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact-erf GELU in f32 (torch nn.GELU default semantics)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + 1e-5)


def _heads_attn(q, k, v, num_heads):
    """q, k, v: (G, W, E) fp32-accurate attention per head; returns (G, W, E)."""
    g, w, e = q.shape
    hd = e // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vh.dtype)
        outs.append(jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                    .astype(vh.dtype))
    return jnp.concatenate(outs, axis=-1) if num_heads > 1 else outs[0]


def _mm(x, w):
    """(G, W, C) @ (C, E) with f32 accumulation, result in x.dtype."""
    return jax.lax.dot_general(
        x, w.astype(x.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _block_body(zx, zy, wts, num_heads):
    (cq, ck, cv, cvb, cp,
     f1w1, f1b1, f1w2, f1b2,
     sq, sk, sv, svb, sp,
     f2w1, f2b1, f2w2, f2b2) = wts
    dt = zx.dtype

    # cross attention (pre-norm, shared weights, bidirectional)
    nx = _ln(zx).astype(dt)
    ny = _ln(zy).astype(dt)
    qx, kx, vx = _mm(nx, cq), _mm(nx, ck), _mm(nx, cv) + cvb.astype(dt)
    qy, ky, vy = _mm(ny, cq), _mm(ny, ck), _mm(ny, cv) + cvb.astype(dt)
    zx = zx + _mm(_heads_attn(qx, ky, vy, num_heads), cp)
    zy = zy + _mm(_heads_attn(qy, kx, vx, num_heads), cp)

    # ffn_c
    def ffn(z, w1, b1, w2, b2):
        n = _ln(z).astype(dt)
        hdn = _gelu_exact(_mm(n, w1).astype(jnp.float32)
                          + b1.astype(jnp.float32)).astype(dt)
        return z + _mm(hdn, w2) + b2.astype(dt)

    zx = ffn(zx, f1w1, f1b1, f1w2, f1b2)
    zy = ffn(zy, f1w1, f1b1, f1w2, f1b2)

    # self attention
    for ref in (0, 1):
        z = zx if ref == 0 else zy
        n = _ln(z).astype(dt)
        q, k, v = _mm(n, sq), _mm(n, sk), _mm(n, sv) + svb.astype(dt)
        z = z + _mm(_heads_attn(q, k, v, num_heads), sp)
        if ref == 0:
            zx = z
        else:
            zy = z

    # ffn
    zx = ffn(zx, f2w1, f2b1, f2w2, f2b2)
    zy = ffn(zy, f2w1, f2b1, f2w2, f2b2)
    return zx, zy


def _kernel(zx_ref, zy_ref, *refs, num_heads):
    wts = [r[...] for r in refs[:N_WEIGHTS]]
    ox_ref, oy_ref = refs[N_WEIGHTS], refs[N_WEIGHTS + 1]
    ox, oy = _block_body(zx_ref[...], zy_ref[...], wts, num_heads)
    ox_ref[...] = ox
    oy_ref[...] = oy


def _pack_weights(p):
    """Flatten the basic_attn_block param dict into the kernel weight order.
    Biases are reshaped to (1, n) (TPU scalars/vectors want 2D)."""
    def b2d(b):
        return b.reshape(1, -1)
    c, s = p["cross_attn"]["attn"], p["self_attn"]["attn"]
    f1, f2 = p["ffn_c"]["ffn"], p["ffn"]["ffn"]
    return [
        c["q"]["weight"], c["k"]["weight"], c["v"]["weight"],
        b2d(c["v"]["bias"]), c["proj"]["weight"],
        f1["0"]["weight"], b2d(f1["0"]["bias"]),
        f1["2"]["weight"], b2d(f1["2"]["bias"]),
        s["q"]["weight"], s["k"]["weight"], s["v"]["weight"],
        b2d(s["v"]["bias"]), s["proj"]["weight"],
        f2["0"]["weight"], b2d(f2["0"]["bias"]),
        f2["2"]["weight"], b2d(f2["2"]["bias"]),
    ]


def _row_group(bh, w, c, e, itemsize, vmem_budget=9 * 2 ** 20):
    weights = (8 * c * e + 4 * e * c) * itemsize  # resident once
    per_row = 2 * 4 * w * max(c, e) * itemsize * 2 + 2 * w * w * 4
    g = max(1, (vmem_budget - weights) // max(per_row, 1))
    g = min(g, bh)
    while g > 1 and bh % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_basic_attn_block(p, z, num_heads=1, interpret=False):
    """Drop-in replacement for models.attention.basic_attn_block.

    z: (2B, H, W, C) — left view rows then right view rows on the batch axis.
    """
    two_b, h, w, c = z.shape
    b = two_b // 2
    e = p["cross_attn"]["attn"]["q"]["weight"].shape[1]
    x = z[:b].reshape(b * h, w, c)
    y = z[b:].reshape(b * h, w, c)
    wts = [t.astype(z.dtype) for t in _pack_weights(p)]

    g = _row_group(b * h, w, c, e, z.dtype.itemsize)
    mem = ({"memory_space": pltpu.VMEM}
           if _HAS_PLTPU and not interpret else {})
    row_spec = pl.BlockSpec((g, w, c), lambda i: (i, 0, 0), **mem)
    w_specs = [pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim, **mem)
               for t in wts]
    ox, oy = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=(b * h // g,),
        in_specs=[row_spec, row_spec] + w_specs,
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((b * h, w, c), z.dtype)] * 2,
        interpret=interpret,
    )(x, y, *wts)
    return jnp.concatenate([ox.reshape(b, h, w, c),
                            oy.reshape(b, h, w, c)], axis=0)
