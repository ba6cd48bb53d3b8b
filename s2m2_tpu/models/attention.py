"""Attention primitives and block wrappers.

Functional NHWC re-design of the reference attention stack
(reference: src/s2m2/core/model/attentions.py). All LayerNorms are
affine-free pre-norms (reference: attentions.py:117,148,182). Softmax and
normalization statistics run in fp32; matmuls run in the compute dtype
(MXU bf16 path) with fp32 accumulation.

Two attention families:
  * scanline (1D) attention: every image row is an independent sequence —
    rows fold into the batch axis, which on TPU is embarrassingly parallel
    and shards freely over the mesh 'band' axis.
  * global (2D) attention at the 1/32 bottleneck, optionally with the
    factorized sinc relative PE (see pe.py) and symmetric cross-view
    attention between the left/right halves of the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .pe import pe_contract
from ..ops import flash_attention as _fa

# Pallas kernel dispatch. Measured on v5e at XL shapes: the fused
# bidirectional cross kernel wins standalone, but swapping BOTH attention
# families in-context regressed end-to-end FPS (custom calls break XLA's
# fusion around the projections), so the default is XLA everywhere; flip per
# family with set_use_pallas(self_attn=..., cross_attn=...) to experiment.
# All toggles live in the central registry (s2m2_tpu/flags.py) so tests can
# snapshot/restore them wholesale.
import os as _os

from .. import flags as _flags

_env = _os.environ.get("S2M2_PALLAS_ATTN", "")
_flags.define_value(
    "pallas_self", _env in ("all", "self"), env="S2M2_PALLAS_ATTN",
    doc="Pallas scanline self-attention kernel (measured counter-example)")
_flags.define_value(
    "pallas_cross", _env in ("all", "cross"), env="S2M2_PALLAS_ATTN",
    doc="Pallas bidirectional cross-attention kernel (measured counter-ex.)")
_MAX_PALLAS_SEQ = 768

# bf16 storage for attention score/probability matrices. Softmax statistics
# stay fp32 (the fp32-island invariant); only the HBM-resident NxN buffers
# round to bf16 — halving the dominant MRT traffic. Parity impact is bounded
# by tests/test_model_parity.py (golden) with the flag on.
_flags.define_env_bool(
    "bf16_scores", "S2M2_BF16_SCORES", "1",
    doc="bf16 storage for NxN attention score/prob matrices (default ON)")


def set_bf16_scores(enabled: bool):
    _flags.set_flag("bf16_scores", enabled)


def _score_dtype(compute_dtype):
    """Storage dtype for the NxN score/prob matrices.

    The MXU always accumulates dots in fp32 internally; asking the dot for
    a bf16 result rounds that fp32 accumulator once — identical floats to
    computing fp32 and casting, but XLA materializes no fp32 NxN buffer
    (measured: standalone f32[2,8,1216,1216] buffers when the cast is a
    separate op)."""
    if _flags.get("bf16_scores") and compute_dtype != jnp.float32:
        return jnp.bfloat16
    return jnp.float32


def _softmax_scores(score, out_dtype):
    """fp32-statistics softmax with configurable storage precision."""
    attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1)
    return attn.astype(out_dtype)


def set_use_pallas(enabled=None, *, self_attn=None, cross_attn=None):
    if enabled is not None:
        _flags.set_flag("pallas_self", enabled)
        _flags.set_flag("pallas_cross", enabled)
    if self_attn is not None:
        _flags.set_flag("pallas_self", self_attn)
    if cross_attn is not None:
        _flags.set_flag("pallas_cross", cross_attn)


def _pallas_ok(n, kind):
    on = _flags.get("pallas_self" if kind == "self" else "pallas_cross")
    return (on and n <= _MAX_PALLAS_SEQ
            and jax.default_backend() not in ("cpu",))


def _split_heads(x, num_heads):
    b, n, d = x.shape
    if num_heads == 1:  # pure reshape — no transpose copy
        return x.reshape(b, 1, n, d)
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    if h == 1:
        return x.reshape(b, n, d)
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def sdpa(q, k, v, allow_pallas=True):
    """Scaled dot-product attention, fp32 softmax, (B, heads, N, D) layout.

    Dispatches to the Pallas row-attention kernel on TPU (f32 scores stay in
    VMEM); otherwise the reference XLA einsum path. Inside an int8 quant
    context the QK^T/PV matmuls run on the int8 MXU path with int8
    score/prob storage (models/quant.py::sdpa_maybe_quantized).

    allow_pallas=False pins the XLA path regardless of the S2M2_PALLAS_ATTN
    family flags — the 4D CROSS path passes it so a 'self'-family Pallas
    experiment cannot silently change the cross family's backend too (the
    per-family bisection contract of set_pallas_attention)."""
    from . import quant as _q
    if _q.active():
        out = _q.sdpa_maybe_quantized(q, k, v)
        if out is not None:
            return out
    b, h, n, d = q.shape
    if allow_pallas and _pallas_ok(n, "self"):
        fold = lambda x: x.reshape(b * h, n, d)
        out = _fa.scanline_attention(fold(q), fold(k), fold(v))
        return out.reshape(b, h, n, d)
    scale = q.shape[-1] ** -0.5
    score = jnp.einsum("bhic,bhjc->bhij", q * scale, k,
                       preferred_element_type=_score_dtype(v.dtype))
    attn = _softmax_scores(score, v.dtype)
    return jnp.einsum("bhij,bhjc->bhic", attn, v,
                      preferred_element_type=v.dtype)


def self_attn(p, x, num_heads, pe=None):
    """Self attention on (B, N, C) tokens (reference: attentions.py:8-54).

    pe: None, or (ty, tx, h, w) — factorized relative-PE context. With PE the
    attention matrix is materialized (needed for the PE contraction), exactly
    as the reference does on its use_pe path.

    Note: merging the q/k/v projections into one widened matmul was tried and
    REGRESSED end-to-end XL FPS by ~11% on v5e — XLA schedules the three
    separate projections better. Keep them separate. On the int8 path the
    three projections share ONE quantized copy of x (share_gemm_input).
    A "contract the head axis in place" reformulation (reshape-only
    (B,N,H,D) q/k/v, head axis batched mid-position in the dots, head merge
    folded into the projection contraction) was built and cost-analyzed:
    +3.9 GB of relayout copies on the XL MRT (both at h==1 and h>1) — XLA's
    layout assignment prefers exactly this (B,H,N,D) form, so the explicit
    _split_heads/_merge_heads transposes stay.
    """
    from . import quant as _q
    x = _q.share_gemm_input(x) if _q.active() else x
    q = _split_heads(layers.linear(p["q"], x), num_heads)
    k = _split_heads(layers.linear(p["k"], x), num_heads)
    v = _split_heads(layers.linear(p["v"], x), num_heads)
    if pe is not None:
        ty, tx, h, w = pe
        scale = q.shape[-1] ** -0.5
        score = jnp.einsum("bhic,bhjc->bhij", q * scale, k,
                           preferred_element_type=_score_dtype(v.dtype))
        attn = _softmax_scores(score, v.dtype)
        out = jnp.einsum("bhij,bhjc->bhic", attn, v,
                         preferred_element_type=v.dtype)
        pe_sum = pe_contract(attn, ty, tx, h, w).astype(v.dtype)
        out = out + layers.linear(p["pe_proj"], pe_sum)
    else:
        out = sdpa(q, k, v)
    return layers.linear(p["proj"], _merge_heads(out))


def cross_attn_packed(p, xy, b0, num_heads):
    """Symmetric weight-shared bidirectional cross attention on the packed
    (left|right) batch (reference: attentions.py:57-96).

    The two views share Q/K/V weights, so every projection runs ONCE on the
    packed views; the x<->y swap is expressed as contiguous half-batch
    slices feeding the two attention calls (free — unlike the entry
    concat+slice round trips of a per-view API, or a jnp.roll of k/v which
    measured +24 ms on XL). xy: (2*b0, N, C), left half first.
    """
    from . import quant as _q
    xy = _q.share_gemm_input(xy) if _q.active() else xy
    q = _split_heads(layers.linear(p["q"], xy), num_heads)
    k = _split_heads(layers.linear(p["k"], xy), num_heads)
    v = _split_heads(layers.linear(p["v"], xy), num_heads)
    b, h, n, d = q.shape
    if _pallas_ok(n, "cross"):
        fold = lambda t: t.reshape(-1, n, d)  # (b0, h, n, d) -> (b0*h, n, d)
        ox, oy = _fa.scanline_cross_attention(
            fold(q[:b0]), fold(k[:b0]), fold(v[:b0]),
            fold(q[b0:]), fold(k[b0:]), fold(v[b0:]))
        out = jnp.concatenate([ox, oy], axis=0).reshape(b, h, n, d)
    else:
        # x attends to y and vice versa; contiguous half-batch slices are
        # free (a jnp.roll of k/v measured +24 ms on XL — extra k/v copies)
        ox = sdpa(q[:b0], k[b0:], v[b0:])
        oy = sdpa(q[b0:], k[:b0], v[:b0])
        out = jnp.concatenate([ox, oy], axis=0)
    return layers.linear(p["proj"], _merge_heads(out))


def cross_attn(p, x, y, num_heads):
    """Two-view convenience wrapper over cross_attn_packed."""
    b0 = x.shape[0]
    out = cross_attn_packed(p, jnp.concatenate([x, y], axis=0), b0, num_heads)
    return out[:b0], out[b0:]


# ---------------------------------------------------------------------------
# Block wrappers. All take z of shape (B, H, W, C) (NHWC; the reference keeps
# NCHW and permutes per block — we are channel-last throughout).
# ---------------------------------------------------------------------------

# Keep scanline attention on the 4D block shape (rows as a dot batch dim,
# no (2B,H,W,C)<->(2B*H,W,C) fold reshapes) for heads==1 blocks. The fold
# forces relayout copies at the block boundaries (the (B,H,W,C) layouts XLA
# assigns are not fold-bitcastable: in the XL MRT census the fold family is
# ~3.6 GB of {2,0,1}/{3,0,2,1} buffers that vanish in the 4D form, total
# cost analysis -0.8 GB with the z0 stream settling on one row-major
# layout). Measured on v5e XL@1216x1024 int8: 3.141 vs 3.086 FPS same-day
# (+1.8%; best recorded for the row) — DEFAULT ON. S2M2_ATTN_4D=0 restores
# the fold path (heads>1 blocks always use it).
_flags.define_env_bool(
    "attn_4d", "S2M2_ATTN_4D", "1",
    doc="heads==1 scanline attention on the 4D block shape (default ON)")

# Multi-head extension of the no-fold 4D path: heads become PER-HEAD WEIGHT
# COLUMN SLICES, each head an independent (B,R,W,d) sdpa on the 4D block
# shape, with the head-merge concat folded into the output projection as a
# sum of per-head row-sliced dots (concat-contraction identity). Candidate
# layouts were compile-censused at the real XL z1/z2 shapes
# (scripts/probe_mh4d.py, reads+writes, 2 blocks + FFN):
#   z1 (2,128,152,384) h=2: fold 2.825 GB, heads-batched-5D 2.286,
#     SLICED 2.099 (-26% — the bf16[256,152,2,192] transpose pairs and
#     bf16[256,152,384] fold relayouts of the round-4 copy census vanish);
#   z2 (2,64,76,768) h=4: fold 1.389, SLICED 1.470 (the nh x 3 re-reads of
#     zn outweigh the copies saved at the smaller spatial size; a per-head
#     fused-qkv variant censuses 1.274 but regresses z1 to 3.245, and the
#     z1 family is ~2x the z2 family, so one uniform sliced path is kept).
# The heads-as-second-dot-batch-dim forms (nhd/hnd) LOSE everywhere —
# consistent with the round-3 "+3.9 GB head axis in place" counter-example.
# The 2D GLOBAL blocks (z3, heads=8, 1216 tokens) keep the fold path:
# sliced censuses 0.777 vs fold's 0.635 GB r+w there — 8 heads means 24
# re-reads of zn, and the (2,8,1216,96) split costs only ~8 MB of copies.
# Full-forward census (attr_phys_traffic --int8): copies 21.9 -> 18.6 GB,
# total 131.2 -> 128.6 GB, the bf16[256,152,384]x36 fold bucket gone.
# Measured e2e on v5e XL@1216x1024 int8, same-session A/B: 3.173 vs 3.114
# FPS (+1.9%) — DEFAULT ON. S2M2_ATTN_4D_MH=0 restores the fold path.
_flags.define_env_bool(
    "attn_4d_mh", "S2M2_ATTN_4D_MH", "1", calib_contract=True,
    doc="heads>1 scanline attention as per-head sliced 4D sdpa (no fold)")


def set_attn_4d(enabled: bool):
    _flags.set_flag("attn_4d", enabled)


def set_attn_4d_mh(enabled: bool):
    _flags.set_flag("attn_4d_mh", enabled)


def _head_cols(p, sl):
    """Column-sliced linear params for one head (q/k/v projections). Slices
    are trace-time views of the weight/bias/w_scale — per-output-channel
    int8 weight scales slice with their columns."""
    out = {"weight": p["weight"][:, sl]}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"][sl]
    if "w_scale" in p:
        out["w_scale"] = p["w_scale"][:, sl]
    return out


def _head_rows(p, sl):
    """Row-sliced output-projection params for one head: y = sum_h out_h @
    W[h*d:(h+1)*d, :] == concat(out_h) @ W. w_scale is per-OUTPUT-channel,
    so it rides whole; the (full-width) bias is added once by the caller."""
    out = {"weight": p["weight"][sl, :]}
    if "w_scale" in p:
        out["w_scale"] = p["w_scale"]
    return out


def _attn_4d_sliced(p, zn, num_heads, cross_b0=None):
    """Multi-head scanline attention on the 4D (B, R, W, C) block shape via
    per-head weight slices; returns the pre-residual projection output.
    cross_b0: None for self attention; for the packed cross form, the
    half-batch index at which the right view starts (the x<->y swap is two
    batch-axis slices per head, as in _cross_attn_4d)."""
    from . import quant as _q
    if _q.active():
        zn = _q.share_gemm_input(zn)
        # full-weight prequantization BEFORE slicing: keeps per-head slices
        # bit-identical to an offline-quantized tree and gates
        # quantizability by the FULL weight shape in observe and quantize
        # modes alike (see quant.prequantize_linear)
        p = {k: (_q.prequantize_linear(v) if k in ("q", "k", "v", "proj")
                 else v) for k, v in p.items()}
    d = p["q"]["weight"].shape[1] // num_heads
    acc = None
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q = layers.linear(_head_cols(p["q"], sl), zn)
        k = layers.linear(_head_cols(p["k"], sl), zn)
        v = layers.linear(_head_cols(p["v"], sl), zn)
        if cross_b0 is None:
            out = sdpa(q, k, v, allow_pallas=False)
        else:
            b0 = cross_b0
            out = jnp.concatenate(
                [sdpa(q[:b0], k[b0:], v[b0:], allow_pallas=False),
                 sdpa(q[b0:], k[:b0], v[:b0], allow_pallas=False)], axis=0)
        y = layers.linear(_head_rows(p["proj"], sl), out)
        acc = y if acc is None else acc + y
    if "bias" in p["proj"] and p["proj"]["bias"] is not None:
        acc = acc + p["proj"]["bias"].astype(acc.dtype)
    return acc


def _self_attn_4d(p, zn, z):
    """heads==1 scanline self attention directly on (B, H, W, C): H rides as
    a dot batch dim; zero reshapes. zn is the pre-normed input, z the
    residual. The attention core is sdpa() — shape-generic over (b,h,n,d),
    so the (B,H,W,C) block rides through unchanged and the S2M2_INT8_ATTN
    opt-in applies on this path too (the Pallas opt-ins never reach here:
    the callers guard on not _USE_PALLAS_*)."""
    from . import quant as _q
    zn = _q.share_gemm_input(zn) if _q.active() else zn
    q = layers.linear(p["q"], zn)
    k = layers.linear(p["k"], zn)
    v = layers.linear(p["v"], zn)
    return layers.linear(p["proj"], sdpa(q, k, v)) + z


def _cross_attn_4d(p, zn, z):
    """heads==1 scanline cross-view attention on (2B, H, W, C) (left half
    first on the batch axis): the view swap is two half-batch slices; each
    direction is one sdpa() call on the 4D block shape."""
    from . import quant as _q
    zn = _q.share_gemm_input(zn) if _q.active() else zn
    q = layers.linear(p["q"], zn)
    k = layers.linear(p["k"], zn)
    v = layers.linear(p["v"], zn)
    b0 = q.shape[0] // 2
    # allow_pallas=False: this path is only reachable with the Pallas CROSS
    # flag off, and must not dispatch on the SELF flag (sdpa docstring)
    out = jnp.concatenate([sdpa(q[:b0], k[b0:], v[b0:], allow_pallas=False),
                           sdpa(q[b0:], k[:b0], v[:b0], allow_pallas=False)],
                          axis=0)
    return layers.linear(p["proj"], out) + z


def self_attn_block_1d(p, z, num_heads, store=False):
    """Scanline self attention: rows fold into batch (reference: 99-128).

    z may be a quant.ResidualInt8 (int8-resident carry from the previous
    sublayer under the int8r residency policy); store=True re-quantizes the
    output carry (basic_attn_block sets it for all but the exit sublayer)."""
    from . import quant as _q
    z = _q.residual_load(z)
    b, h, w, c = z.shape
    # Pallas opt-ins need the folded (B*H, W, C) form — keep them reachable
    if (_flags.get("attn_4d") and num_heads == 1
            and not _flags.get("pallas_self")):
        out = _self_attn_4d(p["attn"], layers.layer_norm(z), z)
    elif (_flags.get("attn_4d") and _flags.get("attn_4d_mh")
          and not _flags.get("pallas_self")):
        out = _attn_4d_sliced(p["attn"], layers.layer_norm(z), num_heads) + z
    else:
        zf = z.reshape(b * h, w, c)
        out = (self_attn(p["attn"], layers.layer_norm(zf), num_heads)
               + zf).reshape(b, h, w, c)
    return _q.residual_store(out) if store else out


def cross_attn_block_1d(p, z, num_heads, store=False):
    """Scanline cross-view attention. z is (2B, H, W, C), left half then right
    half on the batch axis (reference: 131-161).

    Folding (2B, H, W, C) -> (2B*H, W, C) keeps the left view's rows in the
    first half of the folded batch, so the already-packed fold feeds
    cross_attn_packed directly (no intermediate slice/concat round trip).
    store/ResidualInt8 carry semantics as in self_attn_block_1d."""
    from . import quant as _q
    z = _q.residual_load(z)
    b2, h, w, c = z.shape
    # Pallas opt-ins need the folded (B*H, W, C) form — keep them reachable
    if (_flags.get("attn_4d") and num_heads == 1
            and not _flags.get("pallas_cross")):
        out = _cross_attn_4d(p["attn"], layers.layer_norm(z), z)
    elif (_flags.get("attn_4d") and _flags.get("attn_4d_mh")
          and not _flags.get("pallas_cross")):
        out = _attn_4d_sliced(p["attn"], layers.layer_norm(z), num_heads,
                              cross_b0=b2 // 2) + z
    else:
        zf = layers.layer_norm(z).reshape(b2 * h, w, c)
        out = cross_attn_packed(p["attn"], zf, b2 * h // 2, num_heads)
        out = out.reshape(b2, h, w, c) + z
    return _q.residual_store(out) if store else out


def self_attn_block_2d(p, z, num_heads, pe=None):
    """Global 2D self attention over HW tokens (reference: 165-193)."""
    b, h, w, c = z.shape
    zf = z.reshape(b, h * w, c)
    pe_ctx = None if pe is None else (pe[0], pe[1], h, w)
    out = self_attn(p["attn"], layers.layer_norm(zf), num_heads, pe_ctx) + zf
    return out.reshape(b, h, w, c)


def cross_attn_block_2d(p, z, num_heads):
    """Global 2D cross-view attention (reference: 197-226)."""
    b2, h, w, c = z.shape
    zf = layers.layer_norm(z).reshape(b2, h * w, c)
    out = cross_attn_packed(p["attn"], zf, b2 // 2, num_heads)
    return out.reshape(b2, h, w, c) + z


def ffn(p, z, store=False):
    """Pre-norm MLP block (reference: 229-250).

    store/ResidualInt8 carry semantics as in self_attn_block_1d (the 2D
    global blocks never pass store, so the bottleneck stream stays float)."""
    from . import quant as _q
    z = _q.residual_load(z)
    z_norm = layers.layer_norm(z)
    out = layers.linear(p["ffn"]["0"], z_norm)
    out = layers.linear(p["ffn"]["2"], layers.gelu(out))
    out = out + z
    return _q.residual_store(out) if store else out


def conv_block_2d(p, z):
    """Dual-branch conv block: 3x3 MLP-conv + 1x1 MLP-conv (reference: 255-281).
    Note: no residual — the two branches are summed. Both branch entries
    read the same z: one shared int8 copy on the quant path."""
    from . import quant as _q
    z = _q.share_gemm_input(z) if _q.active() else z
    a = layers.conv2d(p["convs"]["0"], z)
    a = layers.conv2d(p["convs"]["2"], layers.gelu(a))
    b = layers.conv2d(p["convs_1x"]["0"], z)
    b = layers.conv2d(p["convs_1x"]["2"], layers.relu(b))
    return a + b


def global_attn_block(p, z, num_heads, pe=None, use_cross_attn=False):
    """[cross + FFN] + self + FFN at the 2D bottleneck (reference: 284-321)."""
    if use_cross_attn:
        z = cross_attn_block_2d(p["cross_attn"], z, num_heads)
        z = ffn(p["ffn_c"], z)
    z = self_attn_block_2d(p["self_attn"], z, num_heads, pe)
    z = ffn(p["ffn"], z)
    return z


def basic_attn_block(p, z, num_heads):
    """Scanline cross + FFN + self + FFN (reference: 324-355).

    Under the int8r residency policy the three interior sublayer carries are
    stored int8 (store=True -> quant.residual_store); the block enters and
    exits on plain float tensors, so fusion/down/up junctions outside never
    see a wrapper."""
    z = cross_attn_block_1d(p["cross_attn"], z, num_heads, store=True)
    z = ffn(p["ffn_c"], z, store=True)
    z = self_attn_block_1d(p["self_attn"], z, num_heads, store=True)
    z = ffn(p["ffn"], z)
    return z
