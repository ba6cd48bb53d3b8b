"""Space-to-depth conv reformulations for TPU lane efficiency.

TPU vector lanes pad the channel axis to 128, so full-resolution convs with
tiny channel counts (the CNN stem's 3->16/16->16 1x1s, the upsample-mask
heads' 1/3/9/16/48-channel convs — reference: src/s2m2/core/model/
submodules.py:63-93,96-145) waste most of the MXU/VPU. Every transform here
is an *algebraically exact* weight rearrangement: the reformulated op
computes the same floats (up to reduction reassociation) at half the spatial
resolution with 4x the channels.

Packed layout convention (factor 2): a full-res tensor (B, H, W, C) packs to
(B, H/2, W/2, 4*C) with **phase-major** channels —
packed[b, p, q, (a*2+b2)*C + c] == full[b, 2p+a, 2q+b2, c].

Transforms:
  * 1x1 conv            -> block-diagonal 1x1 conv on packed channels
  * kxk stride-2 conv   -> ceil-sized conv on the packed grid (unpacked out)
  * 3x3 stride-1 conv   -> 3x3 conv on packed channels (packed out)
  * 2x2 stride-2 convT  -> 1x1 conv emitting packed output channels
All paddings match the torch conventions used by layers.conv2d /
conv_transpose2d (zero padding k//2; convT k2s2 has no padding).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import layers
from .. import flags as _flags

_flags.define_env_bool(
    "s2d_slices", "S2M2_S2D_SLICES", "0",
    doc="strided-slice space_to_depth (measured -4.6% counter-example)")


def set_s2d_slices(enabled: bool):
    _flags.set_flag("s2d_slices", enabled)


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels.

    Default = the 6D reshape/transpose form. A strided-slices+concat
    rewrite (S2M2_S2D_SLICES=1; identical floats, asserted in
    tests/test_packing) analyzed -0.85 GB of physical encoder traffic
    (the reshape form pads 6D layouts on the stem input: 971 MB physical
    x2 for a 30 MB logical tensor) but MEASURED -4.6% e2e on XL@1216 int8
    (3.00 vs 3.13/3.14 FPS, bisected round 4) - the slice form's gain in
    the stem is outweighed by worse downstream layout choices. Kept as a
    flag-gated counter-example per repo convention."""
    if _flags.get("s2d_slices"):
        return jnp.concatenate([x[:, 0::2, 0::2], x[:, 0::2, 1::2],
                                x[:, 1::2, 0::2], x[:, 1::2, 1::2]], axis=-1)
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, 2, 2, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """(B, H/2, W/2, 4C) phase-major -> (B, H, W, C)."""
    b, hp, wp, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hp, wp, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, 2, W/2, 2, C)
    return x.reshape(b, 2 * hp, 2 * wp, c)


def pack_pointwise_s2d(p):
    """1x1 conv params -> a 2x2/stride-2 conv on the RAW full-res input that
    computes conv1x1_blockdiag(space_to_depth(x)) in one op — the
    space-to-depth becomes the conv's strided access pattern, so the packed
    intermediate (and its 6D reshape/transpose relayout, 2.1 GB physical
    for a 30 MB logical tensor on the XL stem, round-4 attribution) never
    materializes. Output channel group ph=(a*2+b2) reads only tap (a,b2):
    wp[a, b2, ci, ph*cout + co] = w[0, 0, ci, co]. Apply with
    conv2d(stride=2, padding=0); identical floats to the two-op form
    (asserted in tests/test_packing.py)."""
    w = p["weight"]  # (1, 1, Cin, Cout)
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((2, 2, cin, 4 * cout), w.dtype)
    for a in range(2):
        for b2 in range(2):
            ph = a * 2 + b2
            wp = wp.at[a, b2, :, ph * cout:(ph + 1) * cout].set(w[0, 0])
    out = {"weight": wp}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = jnp.tile(p["bias"], 4)
    return out


def _phase_of(u):
    """Full-res tap offset u -> (packed offset, phase)."""
    a = u % 2
    return (u - a) // 2, a


def pack_pointwise(p):
    """1x1 conv params -> block-diagonal packed params (4Cin -> 4Cout)."""
    w = p["weight"]  # (1, 1, Cin, Cout)
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
    for ph in range(4):
        wp = wp.at[0, 0, ph * cin:(ph + 1) * cin,
                   ph * cout:(ph + 1) * cout].set(w[0, 0])
    out = {"weight": wp}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = jnp.tile(p["bias"], 4)
    return out


def pack_strided_conv(p):
    """kxk stride-2 conv (torch pad k//2) -> conv on the packed grid.

    Output is the plain (unpacked) stride-2 result: a kxk/s2 conv's output
    already lives on the half-res grid. Packed kernel size is
    ceil((k//2)/2)*2 + 1 (3 for k=5, 2->use 3 for k=3).
    """
    w = p["weight"]  # (kh, kw, Cin, Cout)
    kh, kw, cin, cout = w.shape
    r_h, r_w = kh // 2, kw // 2
    # packed tap range for u in [-r, r]: du in [floor(-r/2), floor(r/2)]
    dh_lo, dh_hi = _phase_of(-r_h)[0], _phase_of(r_h)[0]
    dw_lo, dw_hi = _phase_of(-r_w)[0], _phase_of(r_w)[0]
    # symmetric odd kernel so layers.conv2d's k//2 padding lines up
    kph = 2 * max(dh_hi, -dh_lo) + 1
    kpw = 2 * max(dw_hi, -dw_lo) + 1
    och, ocw = kph // 2, kpw // 2
    wp = jnp.zeros((kph, kpw, 4 * cin, cout), w.dtype)
    for u in range(-r_h, r_h + 1):
        du, a = _phase_of(u)
        for v in range(-r_w, r_w + 1):
            dv, b2 = _phase_of(v)
            ph = a * 2 + b2
            wp = wp.at[du + och, dv + ocw,
                       ph * cin:(ph + 1) * cin, :].set(w[u + r_h, v + r_w])
    out = {"weight": wp}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    return out


def pack_conv_s1(p):
    """3x3 stride-1 conv (torch pad 1) -> 3x3 packed conv (4Cin -> 4Cout)."""
    w = p["weight"]  # (3, 3, Cin, Cout)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "only 3x3 stride-1 packing is needed"
    wp = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for e in range(2):          # output phase rows
        for f in range(2):      # output phase cols
            for u in (-1, 0, 1):
                dp, a = _phase_of(e + u)
                for v in (-1, 0, 1):
                    dq, b2 = _phase_of(f + v)
                    wp = wp.at[
                        dp + 1, dq + 1,
                        (a * 2 + b2) * cin:(a * 2 + b2 + 1) * cin,
                        (e * 2 + f) * cout:(e * 2 + f + 1) * cout].set(
                        w[u + 1, v + 1])
    out = {"weight": wp}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = jnp.tile(p["bias"], 4)
    return out


def pack_convT2x2(p):
    """2x2 stride-2 convT (no overlap) -> 1x1 conv emitting packed channels.

    convT(k=2, s=2): out(2i+a, 2j+b) = sum_ci w[a, b, ci, co] * in(i, j)
    — each 2x2 output block is an independent linear map of one input
    pixel, i.e. a 1x1 conv to 4*Cout phase-major packed channels.
    """
    w = p["weight"]  # (2, 2, Cin, Cout) — torch (I,O,kh,kw) reordered
    cin, cout = w.shape[2], w.shape[3]
    # (a, b, ci, co) -> (1, 1, ci, (a*2+b)*cout + co)
    wp = w.transpose(2, 0, 1, 3).reshape(1, 1, cin, 4 * cout)
    out = {"weight": wp}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = jnp.tile(p["bias"], 4)
    return out


def pack_convT3x3(p):
    """3x3 stride-1 pad-1 convT -> packed 3x3 conv.

    A stride-1 convT is a regular conv with the spatially-flipped kernel
    (contracting the I axis), so flip then reuse the stride-1 packing.
    """
    w = p["weight"]
    flipped = {"weight": w[::-1, ::-1]}
    if "bias" in p and p["bias"] is not None:
        flipped["bias"] = p["bias"]
    return pack_conv_s1(flipped)


def concat_packed(tensors, channels):
    """Concatenate packed tensors per-phase (phase-major layout).

    tensors[i] is (B, Hp, Wp, 4*channels[i]); result is
    (B, Hp, Wp, 4*sum(channels)) with the same phase-major convention as a
    full-res channel concat followed by space_to_depth.
    """
    views = [t.reshape(t.shape[0], t.shape[1], t.shape[2], 4, c)
             for t, c in zip(tensors, channels)]
    cat = jnp.concatenate(views, axis=-1)
    b, hp, wp = cat.shape[:3]
    return cat.reshape(b, hp, wp, -1)
