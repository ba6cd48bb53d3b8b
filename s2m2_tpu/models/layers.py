"""Core NHWC layer primitives.

Everything here is a pure function `f(params, x, ...) -> y` over a params pytree
(nested dicts with 'weight'/'bias' leaves). Layouts are TPU-native:

  activations: NHWC
  conv weights: HWIO  (converted from the reference's torch OIHW at load time)
  linear weights: (in, out)

Numerics are kept bit-compatible (up to float re-association) with the torch ops
the reference uses (reference: src/s2m2/core/model/*.py), so converted reference
checkpoints reproduce reference outputs. Normalization statistics always run in
float32 regardless of the compute dtype (the reference relies on torch autocast
doing the same, reference: core/utils/model_utils.py:76).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import quant

_CONV_DN = ("NHWC", "HWIO", "NHWC")

# Express 1x1 stride-1 convs as token dots (channel contraction). Every conv
# INSIDE the MRT is 1x1, so this makes the whole transformer dot-shaped and
# lets XLA assign one consistent (dot-tiled) layout through it instead of
# flip-flopping between conv-tiled and dot-tiled buffers at attention
# boundaries (the 8.6 GB of layout-copy HLO in the round-2 MRT census).
# Env-gated until measured on the target chip: S2M2_DOT_1X1=1 to enable.
from .. import flags as _flags

_flags.define_env_bool(
    "dot_1x1", "S2M2_DOT_1X1", "0",
    doc="1x1 stride-1 convs as token dots (measured -2% counter-example)")


def set_dot_1x1(enabled: bool):
    _flags.set_flag("dot_1x1", enabled)


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU() default."""
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jax.nn.relu(x)


def conv2d(p, x, stride=1, padding=None):
    """2D conv, NHWC. `padding` defaults to the torch convention k//2 per side.

    Matches torch nn.Conv2d(..., stride, padding=k//2) exactly (symmetric
    explicit padding, not XLA 'SAME').
    """
    w = p["weight"]
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(padding[0]), tuple(padding[1])]
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if quant.active():
        acc = quant.conv2d_maybe_quantized(x, p, s, pad, _CONV_DN)
        if acc is not None:
            if "bias" in p and p["bias"] is not None:
                # acc.dtype (not f32): the bf16-accumulator path must not
                # be upcast back to f32 by the bias add
                acc = acc + p["bias"].astype(acc.dtype)
            return acc.astype(quant.unwrap(x).dtype)
    x = quant.unwrap(x)
    if "w_scale" in p:  # pre-quantized weights on a float path: dequantize
        # the dequantized f32 form must NOT trigger the fp32-island upcast
        # below (these are int8-rounded weights, not precision-kept heads)
        w = (w.astype(jnp.float32) * p["w_scale"]).astype(x.dtype)
    if w.dtype == jnp.float32 and x.dtype == jnp.bfloat16:
        # fp32-island conv: fp32 weights kept by the engine's cast policy
        # (engine.cast_params FP32_HEAD_PATHS) force fp32 compute — bf16
        # inputs are upcast rather than the weights rounded down. Output
        # stays fp32 so downstream softmax/logit consumers skip a rounding.
        x = x.astype(jnp.float32)
    if (_flags.get("dot_1x1") and kh == 1 and kw == 1 and s == (1, 1)
            and pad == [(0, 0), (0, 0)]):
        y = jnp.einsum("bhwc,co->bhwo", x, w[0, 0].astype(x.dtype),
                       preferred_element_type=x.dtype)
    else:
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=s, padding=pad,
            dimension_numbers=_CONV_DN)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv_transpose2d(p, x, stride=1, padding=0):
    """2D transposed conv, NHWC, matching torch nn.ConvTranspose2d.

    The stored weight is (kh, kw, I, O) — the torch (I, O, kh, kw) layout with
    spatial dims moved to the front. Implemented as an input-dilated regular
    conv with a spatially-flipped kernel (what cuDNN does under the hood, and
    what XLA fuses best).
    """
    w = p["weight"]  # (kh, kw, I, O)
    kh, kw = w.shape[0], w.shape[1]
    if w.dtype == jnp.float32 and x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)  # fp32-island rule (see conv2d)
    w_flip = w[::-1, ::-1]  # flip spatial taps
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    pd = (padding, padding) if isinstance(padding, int) else tuple(padding)
    pad = [(kh - 1 - pd[0], kh - 1 - pd[0]), (kw - 1 - pd[1], kw - 1 - pd[1])]
    y = lax.conv_general_dilated(
        x, w_flip.astype(x.dtype), window_strides=(1, 1), padding=pad,
        lhs_dilation=s, dimension_numbers=_CONV_DN)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def linear(p, x):
    """Dense layer on the trailing axis. Weight layout (in, out)."""
    if quant.active():
        acc = quant.linear_maybe_quantized(x, p)
        if acc is not None:
            if "bias" in p and p["bias"] is not None:
                acc = acc + p["bias"].astype(acc.dtype)  # see conv2d
            return acc.astype(quant.unwrap(x).dtype)
    x = quant.unwrap(x)
    w = p["weight"]
    if "w_scale" in p:  # pre-quantized weights on a float path: dequantize
        w = (w.astype(jnp.float32) * p["w_scale"]).astype(x.dtype)
    if w.dtype == jnp.float32 and x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)  # fp32-island rule (see conv2d)
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype))
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def layer_norm(x, p=None, eps=1e-5):
    """LayerNorm over the channel (last) axis; fp32 statistics.

    p is None for the reference's elementwise_affine=False norms
    (reference: attentions.py:117 etc.).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(p, x, num_groups=8, eps=1e-5):
    """GroupNorm over NHWC with fp32 statistics (torch nn.GroupNorm semantics).

    Two-pass statistics (the shifted one-pass E[x^2]-mean^2 form loses to
    catastrophic cancellation when |mean| >> std — measured 6.9 absolute
    error at mean ~100 vs the torch oracle, tests/test_layers.py) + a
    precomputed per-group affine application. The affine is the traffic
    win: the naive ((x-mean)*rsqrt)*w+b form made XLA materialize the f32
    (x - mean) broadcast intermediates at (2,512,608,384) on the XL stem
    (956 MB each, probe_refine_hlo.py); folding mean/rsqrt/weight/bias
    into per-group (a, d) coefficients turns the application into one
    scalar-broadcast multiply-add that fuses into the consumer.
    Statistics stay fp32 (the fp32-island invariant)."""
    b, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    scale = lax.rsqrt(var + eps)                       # (b,1,1,g,1) fp32
    wgt = p["weight"].astype(jnp.float32).reshape(1, 1, 1, g, c // g)
    bias = p["bias"].astype(jnp.float32).reshape(1, 1, 1, g, c // g)
    if _flags.get("gn_affine"):
        a = scale * wgt                                # (b,1,1,g,c/g)
        d = bias - mean * a
        y = xf * a + d
    else:
        y = (xf - mean) * scale * wgt + bias
    return y.reshape(b, h, w, c).astype(x.dtype)


# Env gates for the two round-4 encoder reformulations, so e2e bisection is
# flag-based (the repo convention for measured experiments):
#   S2M2_GN_AFFINE=0  -> naive ((x-mean)*rsqrt)*w+b group-norm application
#   S2M2_S2D_SLICES=0 -> reshape/transpose space_to_depth (packing.py)
_flags.define_env_bool(
    "gn_affine", "S2M2_GN_AFFINE", "1",
    doc="group-norm as precomputed per-group affine (default ON)")


def set_gn_affine(enabled: bool):
    _flags.set_flag("gn_affine", enabled)


def avg_pool2d(x, k=2):
    """Non-overlapping average pooling (torch nn.AvgPool2d(k)).

    The init value must be the weak-typed literal 0.0 (not a jnp scalar of
    x.dtype): the literal keeps the op on JAX's recognized
    reduce-window-sum path, which is reverse-mode differentiable in any
    dtype — a concrete typed init made bf16 TRAINING fail linearization."""
    kh, kw = (k, k) if isinstance(k, int) else tuple(k)
    y = lax.reduce_window(x, 0.0, lax.add, (1, kh, kw, 1), (1, kh, kw, 1),
                          "VALID")
    return y / (kh * kw)


def upsample2x_bilinear(x):
    """Bilinear x2 upsample, half-pixel centers (torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def upsample_nearest(x, factor):
    """Integer-factor nearest upsample (== torch 'nearest' for integer scales)."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def replicate_pad(x, pad=1):
    """Edge-replicate spatial padding of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def unfold9(x, pad=1):
    """3x3 neighborhood unfold as 9 shifted slices with replicate padding.

    NHWC analog of the reference's ONNX-friendly custom_unfold
    (reference: core/model/utils.py:9-20). Channel-last output ordering is
    (tap, C): out[..., t*C:(t+1)*C] is the tap (di, dj) with t = di*3+dj,
    matching the reference's channel-major concat after the NCHW->NHWC change.
    """
    b, h, w, c = x.shape
    xp = replicate_pad(x, pad)
    taps = [xp[:, i:i + h, j:j + w, :] for i in range(3) for j in range(3)]
    return jnp.concatenate(taps, axis=-1)  # (B, H, W, 9*C)


def logit(x, eps):
    """torch.logit(x, eps): clamp to [eps, 1-eps] then log(p/(1-p)); fp32."""
    xf = jnp.clip(x.astype(jnp.float32), eps, 1.0 - eps)
    return jnp.log(xf / (1.0 - xf)).astype(x.dtype)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def logsumexp_stable(x, axis, keepdims=False, eps=1e-30):
    """max-shifted log-sum-exp with a clamped sum, matching the reference's
    ONNX-decomposable implementation (reference: submodules.py:147-152)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    y = jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True)
    y = m + jnp.log(jnp.clip(y, min=eps))
    return y if keepdims else jnp.squeeze(y, axis=axis)
