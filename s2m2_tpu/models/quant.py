"""Static-scale int8 quantization for the MXU's reduced-precision path.

Why: on a v5e the bf16 compute roofline for XL@1216x1024 (32.1 TFLOP/frame at
197 TFLOP/s) already exceeds the 156 ms the 6.4 FPS baseline target demands —
bf16 parity is arithmetically impossible on one chip. The int8 MXU path
(~2x bf16 peak; measured 1.7x on 3x3 convs incl. quantize/dequant,
scripts/probe_int8.py) is the only single-chip route, and int8 activations
also halve inter-layer HBM traffic. This mirrors the reference's own
reduced-precision deployment move (its TensorRT fp16 engine,
reference: demo/export_tensorrt.py:26-34) one step further, exactly the way a
TRT int8 engine would: per-(output-)channel weight scales + per-tensor STATIC
activation scales collected by a calibration pass, so the quantize op is a
pure elementwise producer that XLA fuses into the previous layer's epilogue
(dynamic per-call max-abs scales measured slower at token shapes — the extra
reduction pass breaks fusion; probe_int8.py).

Mechanics — site-ordered scales:
  * Every quantizable GEMM (conv2d / linear) input is a "site". Both the
    calibration trace and the quantized trace walk the forward in the same
    deterministic order, so sites are identified by trace order alone — no
    parameter-tree surgery, converted checkpoints stay byte-identical.
  * `observe()`: layers append the fp32 max|x| of each site to the context;
    the jitted observer returns them stacked. Calibrating over several
    frames = elementwise max of the per-frame vectors.
  * `quantized(scales)`: layers consume scales (python floats -> XLA scalar
    constants) in the same order and run
      x_q = clip(round(x / s_x), -127, 127) : int8
      acc = conv/dot(x_q, w_q) : int32      (MXU int8 path)
      y   = acc * (s_x * s_w[c_out]) + bias
    with weights quantized per output channel inside the jit (negligible:
    one elementwise pass over 406M params vs 200+ GB of activation traffic).

fp32 islands are untouched: norm statistics, softmax, Sinkhorn, logits and
the 1-channel disp/conf/occ state never pass through a quantized GEMM.
Low-precision-critical heads (cout < 8, e.g. the disparity update head) are
excluded by `_quantizable`.
"""
from __future__ import annotations

import contextlib
import threading

import jax.numpy as jnp
from jax import lax

from .. import flags as _flags

_state = threading.local()


def _ctx():
    if not hasattr(_state, "mode"):
        _state.mode = None  # None | 'observe' | 'quantize'
        _state.scales = None
        _state.cursor = 0
        _state.observed = None
        _state.aligned = False
        _state.skip_fp32 = False
        _state.residency = False
        _state.percentile = None
    return _state


def active() -> bool:
    return _ctx().mode is not None


@contextlib.contextmanager
def observe(aligned=None, skip_fp32=False, residency=False, percentile=None):
    """Collect per-site amax tracers during a forward trace.

    Yields the list the layers append to; jit the wrapped forward so it
    returns `jnp.stack(collected)` alongside its outputs. `aligned` selects
    the 128-lane-aligned-only site policy for this trace (None = the
    module default set by S2M2_INT8_ALIGNED / set_int8_aligned).
    `skip_fp32` excludes GEMMs whose weights are float32 — the engine sets
    it so its fp32-island heads (engine.FP32_HEAD_PATHS) stay out of the
    int8 path; raw test contexts (all-fp32 params) leave it off.
    `residency` additionally stores the MRT residual stream int8 in HBM
    (see residual_store) — the "int8r" engine precision.
    """
    s = _ctx()
    prev = (s.mode, s.observed, s.aligned, s.skip_fp32, s.residency,
            s.percentile)
    s.mode, s.observed = "observe", []
    s.aligned = (_flags.get("int8_aligned") if aligned is None
                 else bool(aligned))
    s.skip_fp32 = bool(skip_fp32)
    s.residency = bool(residency)
    s.percentile = None if percentile is None else float(percentile)
    try:
        yield s.observed
    finally:
        (s.mode, s.observed, s.aligned, s.skip_fp32, s.residency,
         s.percentile) = prev


@contextlib.contextmanager
def quantized(scales, aligned=None, skip_fp32=False, residency=False):
    """Run a forward with static per-site activation scales (trace-order
    matched to the `observe()` pass that produced them — including the same
    `aligned`/`skip_fp32`/`residency` site policies)."""
    s = _ctx()
    prev = (s.mode, s.scales, s.cursor, s.aligned, s.skip_fp32, s.residency)
    s.mode, s.scales, s.cursor = "quantize", [float(v) for v in scales], 0
    s.aligned = (_flags.get("int8_aligned") if aligned is None
                 else bool(aligned))
    s.skip_fp32 = bool(skip_fp32)
    s.residency = bool(residency)
    try:
        yield
        if s.cursor != len(s.scales):
            raise ValueError(
                f"quantized(): consumed {s.cursor} scales but calibration "
                f"recorded {len(s.scales)} sites — forward paths diverged")
    finally:
        (s.mode, s.scales, s.cursor, s.aligned, s.skip_fp32,
         s.residency) = prev


def dot_1x1() -> bool:
    """The layers.py 1x1-as-dot toggle (central registry; read lazily)."""
    return _flags.get("dot_1x1")


# Alignment-aware site policy ("int8a" engine precision): quantize only GEMMs
# whose channel counts are multiples of the 128 TPU lanes. Motivation (measured,
# round 3): whole-model int8 LOSES on M (C=192 — the int8 (32,128) MXU tiles
# waste more on the padded channel dim than the 2x peak recovers: 4.48 vs 5.46
# FPS bf16 @1216x1024) while its 2C=384 GEMMs tile perfectly. Per-site
# selection keeps the aligned wins without the misaligned losses.
_flags.define_env_bool(
    "int8_aligned", "S2M2_INT8_ALIGNED", "0", calib_contract=True,
    doc="int8 only on 128-lane-aligned GEMMs (the int8a site policy)")


def set_int8_aligned(enabled: bool):
    """Restrict int8 to 128-lane-aligned GEMMs. Must not change between
    calibration and inference (site count)."""
    _flags.set_flag("int8_aligned", enabled)


def _quantizable(w_shape_in, cout, cin=None, aligned=None) -> bool:
    """Quantize only GEMMs with enough input reduction depth to average out
    quantization noise and wide-enough outputs that per-channel weight scales
    don't gate a precision-critical scalar head. Under the aligned-only
    policy, additionally require 128-lane-aligned channel counts."""
    if not (w_shape_in >= 16 and cout >= 8):
        return False
    if aligned is None:
        s = _ctx()
        aligned = (s.aligned if s.mode is not None
                   else _flags.get("int8_aligned"))
    if aligned:
        c_in = w_shape_in if cin is None else cin
        return c_in % 128 == 0 and cout % 128 == 0
    return True


def _record_amax(x):
    """Record a site's activation range statistic: plain amax, or an
    outlier-robust percentile of |x| when the observe context sets one
    (TRT's percentile calibrator analog — one extreme activation no longer
    dictates the whole tensor's scale)."""
    s = _ctx()
    ax = jnp.abs(x.astype(jnp.float32))
    if s.percentile is not None:
        s.observed.append(jnp.percentile(ax.reshape(-1), s.percentile))
    else:
        s.observed.append(jnp.max(ax))


def _next_scale():
    s = _ctx()
    if s.cursor >= len(s.scales):
        raise ValueError(
            "quantized(): forward hit more GEMM sites than calibration "
            "recorded — forward paths diverged")
    v = s.scales[s.cursor]
    s.cursor += 1
    return max(v, 1e-8)


def _quantize_input(x, s_x):
    inv = jnp.float32(1.0 / s_x)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                    -127.0, 127.0).astype(jnp.int8)


class SharedQuantInput:
    """An activation quantized ONCE and consumed by several GEMMs.

    q/k/v (and dual conv branches) read the same tensor; per-site
    quantization makes XLA materialize the bf16 producer output PLUS one
    int8 copy per consumer (the per-consumer quantizes end up inside each
    GEMM's own input fusion, so they never CSE). Wrapping the tensor at its
    definition collapses that to a single int8 materialization whose
    producer (usually a LayerNorm) can fuse the quantize into its epilogue —
    the bf16 intermediate never touches HBM. The observed amax is identical
    to what the per-site pass recorded (same tensor), so calibration
    semantics are unchanged; only the site COUNT shrinks.
    """
    __slots__ = ("x", "q", "scale")

    def __init__(self, x, q=None, scale=None):
        self.x = x
        self.q = q
        self.scale = scale


def share_gemm_input(x):
    """Mark `x` as a multi-GEMM input: records/consumes ONE calibration site
    for all downstream consumers. Returns `x` unchanged outside a quant
    context (the float paths never see the wrapper)."""
    s = _ctx()
    if s.mode is None:
        return x
    if s.mode == "observe":
        _record_amax(x)
        return SharedQuantInput(x)
    s_x = _next_scale()
    return SharedQuantInput(x, _quantize_input(x, s_x), s_x)


def unwrap(x):
    return x.x if isinstance(x, SharedQuantInput) else x


class ResidualInt8:
    """A residual-stream tensor stored int8 in HBM (+ per-tensor scale).

    The "int8r" residency policy: the MRT z0 stream's sublayer carries — the
    tensors the residual adds read and write ~12 times per BasicAttnBlock —
    are the largest bf16 traffic left after GEMM-input quantization
    (scripts/analyze_int8.py: residual/concat streams stay bf16 in plain
    int8). Storing the carry int8 halves those passes; the dequant is a pure
    elementwise op XLA fuses into the consumer (LayerNorm statistics or the
    next residual add), so the bf16 form never round-trips HBM.
    """
    __slots__ = ("q", "scale", "dtype")

    def __init__(self, q, scale, dtype):
        self.q = q
        self.scale = scale
        self.dtype = dtype


def residual_store(z):
    """Mark a residual-stream tensor for int8 HBM residency (one calibration
    site). Identity unless a quant context with residency=True is active.
    In observe mode records the tensor's amax; in quantize mode returns a
    ResidualInt8 the next sublayer dequantizes via residual_load."""
    s = _ctx()
    if s.mode is None or not s.residency:
        return z
    if s.mode == "observe":
        _record_amax(z)
        return z
    s_x = _next_scale()
    return ResidualInt8(_quantize_input(z, s_x), s_x, z.dtype)


def residual_load(z):
    """Dequantize a ResidualInt8 back to its float dtype (fused into the
    consumer by XLA); identity on plain tensors."""
    if isinstance(z, ResidualInt8):
        return (z.q.astype(jnp.float32) * jnp.float32(z.scale)).astype(z.dtype)
    return z


def _quantize_weight(w, reduce_axes):
    """Per-output-channel symmetric int8: returns (w_q, s_w)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    s_w = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(wf / s_w), -127.0, 127.0).astype(jnp.int8)
    return w_q, s_w


def conv2d_maybe_quantized(x, p, strides, padding, dn):
    """int8 conv path when a quant context is active and the site qualifies;
    returns the accumulator in fp32 (bias/cast handled by the caller), or
    None to tell the caller to take the normal bf16/fp32 path.

    Weights are taken PRE-quantized when the param dict carries 'w_scale'
    (quantize_params_tree — int8 weights resident in HBM, no per-frame
    requantization pass over the 406M-param tree); float weights are
    quantized inline (runtime-repacked stem/mask-head weights)."""
    s = _ctx()
    w = p["weight"]
    kh, kw, cin, cout = w.shape
    prequant = "w_scale" in p
    shared = isinstance(x, SharedQuantInput)
    if s.mode is None or not (prequant or _quantizable(kh * kw * cin, cout, cin)):
        return None
    if s.skip_fp32 and not prequant and w.dtype == jnp.float32:
        return None  # fp32-island head (engine cast policy) — stays float
    if s.mode == "observe":
        if not shared:
            _record_amax(x)
        return None
    if shared:
        s_x, x_q = x.scale, x.q
    else:
        s_x = _next_scale()
        x_q = _quantize_input(x, s_x)
    if prequant:
        w_q, s_w = w, p["w_scale"]
    else:
        w_q, s_w = _quantize_weight(w, (0, 1, 2))  # -> s_w (1,1,1,O)
    acc_t = jnp.bfloat16 if _flags.get("int8_acc_bf16") else jnp.int32
    if kh == kw == 1 and strides == (1, 1) and dot_1x1():
        acc = jnp.einsum("bhwc,co->bhwo", x_q, w_q[0, 0],
                         preferred_element_type=acc_t)
    else:
        acc = lax.conv_general_dilated(
            x_q, w_q, window_strides=strides, padding=padding,
            dimension_numbers=dn, preferred_element_type=acc_t)
    scale = s_w.reshape(1, 1, 1, -1) * s_x
    if _flags.get("int8_acc_bf16"):
        return acc * scale.astype(jnp.bfloat16)
    return acc.astype(jnp.float32) * scale


_flags.define_env_bool(
    "int8_attn", "S2M2_INT8_ATTN", "0", calib_contract=True,
    doc="quantized attention internals (measured -2.4% counter-example)")
_flags.define_env_bool(
    "int8_acc_bf16", "S2M2_INT8_ACC_BF16", "0", calib_contract=True,
    doc="int8 GEMMs emit bf16 accumulators (measured neutral opt-in)")


def set_acc_bf16(enabled: bool):
    """bf16 GEMM accumulator residency: int8 convs/dots emit bf16 outputs
    (preferred_element_type=bf16) instead of materializing int32
    accumulators in HBM, and the dequant scale multiply runs in bf16.

    Why: the full-forward physical-traffic attribution
    (scripts/attr_phys_traffic.py, XL@1216x1024 int8) charges ~31 GB of
    physical writes to the s32 accumulator outputs (quant.py conv/dot
    sites, ~2.1x layout-padded) that the dequant fusion immediately
    re-reads — the single largest attributable line item. In practice the
    compiled program shows those s32 accumulators are already
    fusion-INTERNAL (conv fusions root at bf16 dequant outputs), so the
    flag only removes ~3.0 GB physical (127.8 -> 124.8 compile-level) and
    MEASURED NEUTRAL e2e: 3.136 FPS vs the 3.142/3.132 re-baselines on
    XL@1216x1024 v5e (inside the +-1.5% noise band). Default stays OFF
    (s32 accumulators); kept as a tested opt-in. Cost of the flag: one
    extra 2^-9 relative rounding of the integer accumulator BEFORE the
    scale multiply instead of after — drift-bounded at 0.0033/0.0291 px
    on the golden fixtures (tests/test_quant.py::test_int8_acc_bf16_drift).
    The flag must not change between calibration and inference runs that
    share an engine (site counts are unaffected, but programs differ)."""
    _flags.set_flag("int8_acc_bf16", enabled)


def set_int8_attn(enabled: bool):
    """Quantized attention internals (QK^T and PV on the int8 MXU, int8
    score/prob storage). Only engages inside a quant context; the flag
    must not change between calibration and inference (site count).

    Default OFF — measured 2.994 vs 3.067 FPS e2e on XL@1216x1024 v5e
    (-2.4%): the extra quantize/requant elementwise passes cost more than
    the halved NxN traffic saves at these shapes. Kept as a tested opt-in
    (drift-bounded by tests/test_quant.py::test_int8_drift_on_golden)."""
    _flags.set_flag("int8_attn", enabled)


def sdpa_maybe_quantized(q, k, v):
    """int8 attention core for (B, heads, N, D) tensors.

    q/k/v get static calibrated per-tensor scales (3 sites); the softmax
    runs fp32 (island) and its probabilities are re-quantized with a
    PER-ROW dynamic scale pmax/127 (exact range — probabilities are [0,1]
    and each row's max is already computed by the softmax pass, so this
    costs no extra HBM sweep). Returns None outside quantize mode.
    """
    import jax

    s = _ctx()
    if s.mode is None or not _flags.get("int8_attn"):
        return None
    if s.mode == "observe":
        _record_amax(q)
        _record_amax(k)
        _record_amax(v)
        return None
    d = q.shape[-1]
    s_q, s_k, s_v = _next_scale(), _next_scale(), _next_scale()
    q_q = _quantize_input(q, s_q)
    k_q = _quantize_input(k, s_k)
    v_q = _quantize_input(v, s_v)
    acc = jnp.einsum("bhic,bhjc->bhij", q_q, k_q,
                     preferred_element_type=jnp.int32)
    score = acc.astype(jnp.float32) * (s_q * s_k * float(d) ** -0.5)
    attn = jax.nn.softmax(score, axis=-1)  # fp32 island
    pmax = jnp.max(attn, axis=-1, keepdims=True)  # > 0 (rows sum to 1)
    p_q = jnp.round(attn * (127.0 / pmax)).astype(jnp.int8)
    out = jnp.einsum("bhij,bhjc->bhic", p_q, v_q,
                     preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (pmax * (s_v / 127.0))).astype(v.dtype)


def prequantize_linear(p):
    """Trace-time full-weight quantization for a linear that will be SLICED
    per head (attention._attn_4d_sliced). Slicing breaks the prequant/runtime
    symmetry two ways: (a) quantizability would be gated by the SLICED dims
    at runtime but the FULL dims offline (at z2 under the aligned policy the
    cout=96 head slice fails while the full 384 passes — the quantized
    forward then consumes sites observe never recorded), and (b) row slices
    of the proj would get per-slice weight scales at runtime but global
    scales offline. Quantizing the FULL weight here — in observe AND
    quantize modes — makes every sliced consumer see prequant semantics
    gated by the full shape, bit-identical to quantize_params_tree.
    Returns p unchanged outside a quant context / for non-qualifying or
    already-prequantized weights."""
    s = _ctx()
    if s.mode is None or "w_scale" in p:
        return p
    w = p["weight"]
    cin, cout = w.shape
    if not _quantizable(cin, cout, cin):
        return p
    if s.skip_fp32 and w.dtype == jnp.float32:
        return p  # fp32-island head (engine cast policy) — stays float
    w_q, s_w = _quantize_weight(w, (0,))
    out = dict(p)
    out["weight"], out["w_scale"] = w_q, s_w
    return out


def linear_heads_maybe_quantized(x, p, nh, d):
    """int8 path for the head-merging projection of the multi-head 4D
    attention (layers.linear_merge_heads): x (..., nh, i, d) contracted
    with p['weight'] (nh*d, out) viewed as (nh, d, out) — the head-merge
    transpose is folded into the contraction, so no (n, i) relayout copy
    is ever materialized. Same site semantics as linear_maybe_quantized
    (ONE activation site)."""
    s = _ctx()
    w = p["weight"]
    cin, cout = w.shape
    prequant = "w_scale" in p
    shared = isinstance(x, SharedQuantInput)
    if s.mode is None or not (prequant or _quantizable(cin, cout, cin)):
        return None
    if s.skip_fp32 and not prequant and w.dtype == jnp.float32:
        return None  # fp32-island head (engine cast policy) — stays float
    if s.mode == "observe":
        if not shared:
            _record_amax(x)
        return None
    if shared:
        s_x, x_q = x.scale, x.q
    else:
        s_x = _next_scale()
        x_q = _quantize_input(x, s_x)
    if prequant:
        w_q, s_w = w, p["w_scale"]
    else:
        w_q, s_w = _quantize_weight(w, (0,))  # -> s_w (1, out)
    wr = w_q.reshape(nh, d, cout)
    if _flags.get("int8_acc_bf16"):
        acc = jnp.einsum("...nid,ndo->...io", x_q, wr,
                         preferred_element_type=jnp.bfloat16)
        return acc * (s_w.reshape(1, -1)[0] * s_x).astype(jnp.bfloat16)
    acc = jnp.einsum("...nid,ndo->...io", x_q, wr,
                     preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_w.reshape(1, -1)[0] * s_x)


def linear_maybe_quantized(x, p):
    """int8 dense path on the trailing axis; same contract as the conv
    variant. p['weight']: (in, out)."""
    s = _ctx()
    w = p["weight"]
    cin, cout = w.shape
    prequant = "w_scale" in p
    shared = isinstance(x, SharedQuantInput)
    if s.mode is None or not (prequant or _quantizable(cin, cout, cin)):
        return None
    if s.skip_fp32 and not prequant and w.dtype == jnp.float32:
        return None  # fp32-island head (engine cast policy) — stays float
    if s.mode == "observe":
        if not shared:
            _record_amax(x)
        return None
    if shared:
        s_x, x_q = x.scale, x.q
    else:
        s_x = _next_scale()
        x_q = _quantize_input(x, s_x)
    if prequant:
        w_q, s_w = w, p["w_scale"]
    else:
        w_q, s_w = _quantize_weight(w, (0,))  # -> s_w (1, out)
    if _flags.get("int8_acc_bf16"):
        acc = jnp.einsum("...i,io->...o", x_q, w_q,
                         preferred_element_type=jnp.bfloat16)
        return acc * (s_w.reshape(1, -1)[0] * s_x).astype(jnp.bfloat16)
    acc = jnp.einsum("...i,io->...o", x_q, w_q,
                     preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_w.reshape(1, -1)[0] * s_x)


# Subtrees whose conv weights are re-packed at trace time (packing.py weight
# rearrangements) — they must stay float; their sites quantize inline.
_REPACKED_PATHS = (
    "cnn_backbone.conv0",
    "cnn_backbone.conv1_down.0",
    "upsample_mask_1x",
    "upsample_mask_4x_refine",
)


def quantize_params_tree(params, aligned=None, skip_fp32=False):
    """Offline per-output-channel int8 weight quantization of a params
    pytree: qualifying 'weight' leaves become int8 and gain a fp32
    'w_scale' sibling; everything else (biases, norms, small heads,
    runtime-repacked subtrees) is untouched. The engine applies this once
    after calibration — int8 weights halve parameter HBM residency and
    remove the per-frame weight-requantization pass. `aligned` and
    `skip_fp32` (leave float32 weight leaves alone — the engine's
    fp32-island heads) must match the policy the engine traces with."""
    def walk(node, path):
        if not isinstance(node, dict):
            return node
        new = {k: walk(v, f"{path}.{k}" if path else k)
               for k, v in node.items()}
        w = new.get("weight")
        if (w is not None and not isinstance(w, dict)
                and not (skip_fp32 and w.dtype == jnp.float32)
                and not any(path == p or path.startswith(p + ".")
                            for p in _REPACKED_PATHS)):
            if w.ndim == 4:
                kh, kw, cin, cout = w.shape
                if _quantizable(kh * kw * cin, cout, cin, aligned):
                    w_q, s_w = _quantize_weight(w, (0, 1, 2))
                    new["weight"], new["w_scale"] = w_q, s_w
            elif w.ndim == 2:
                cin, cout = w.shape
                if _quantizable(cin, cout, cin, aligned):
                    w_q, s_w = _quantize_weight(w, (0,))
                    new["weight"], new["w_scale"] = w_q, s_w
        return new

    return walk(params, "")
