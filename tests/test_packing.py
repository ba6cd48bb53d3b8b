"""Space-to-depth conv reformulations must match the direct ops exactly
(up to float reassociation)."""
import numpy as np
import jax.numpy as jnp

from s2m2_tpu.models import layers, packing
from s2m2_tpu.models.encoder import cnn_encoder, cnn_encoder_unpacked
from s2m2_tpu.models.init import _conv, _Rng
from s2m2_tpu.models.upsampling import (upsample1x, upsample1x_multi,
                                        upsample4x, upsample4x_packed,
                                        upsample_mask_1x,
                                        upsample_mask_1x_packed,
                                        upsample_mask_4x,
                                        upsample_mask_4x_packed)


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_s2d_d2s_roundtrip(rng):
    x = _rand(rng, (2, 8, 12, 5))
    p = packing.space_to_depth(x)
    assert p.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(packing.depth_to_space(p)),
                                  np.asarray(x))
    # phase-major convention: packed[..., (a*2+b)*C + c] == full[2p+a, 2q+b, c]
    np.testing.assert_array_equal(np.asarray(p[0, 1, 2, 3 * 5 + 4]),
                                  np.asarray(x[0, 3, 5, 4]))


def test_pack_pointwise(rng):
    r = _Rng(0)
    p = _conv(r, 3, 16, 1)
    x = _rand(rng, (2, 8, 12, 3))
    ref = layers.conv2d(p, x)
    got = packing.depth_to_space(
        layers.conv2d(packing.pack_pointwise(p), packing.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pack_strided_conv_5x5(rng):
    r = _Rng(1)
    p = _conv(r, 16, 24, 5)
    x = _rand(rng, (2, 16, 12, 16))
    ref = layers.conv2d(p, x, stride=2)
    got = layers.conv2d(packing.pack_strided_conv(p),
                        packing.space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_strided_conv_3x3(rng):
    r = _Rng(2)
    p = _conv(r, 8, 12, 3)
    x = _rand(rng, (1, 10, 14, 8))
    ref = layers.conv2d(p, x, stride=2)
    got = layers.conv2d(packing.pack_strided_conv(p),
                        packing.space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_conv_s1(rng):
    r = _Rng(3)
    p = _conv(r, 5, 7, 3)
    x = _rand(rng, (2, 8, 10, 5))
    ref = layers.conv2d(p, x)
    got = packing.depth_to_space(
        layers.conv2d(packing.pack_conv_s1(p), packing.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_convT2x2(rng):
    r = _Rng(4)
    p = _conv(r, 6, 4, 2)
    x = _rand(rng, (2, 5, 7, 6))
    ref = layers.conv_transpose2d(p, x, stride=2)
    got = packing.depth_to_space(layers.conv2d(packing.pack_convT2x2(p), x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pack_convT3x3(rng):
    r = _Rng(5)
    p = _conv(r, 2, 6, 3)
    x = _rand(rng, (1, 8, 6, 2))
    ref = layers.conv_transpose2d(p, x, padding=1)
    got = packing.depth_to_space(
        layers.conv2d(packing.pack_convT3x3(p), packing.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_concat_packed(rng):
    a = _rand(rng, (1, 6, 8, 3))
    b = _rand(rng, (1, 6, 8, 5))
    ref = packing.space_to_depth(jnp.concatenate([a, b], axis=-1))
    got = packing.concat_packed(
        [packing.space_to_depth(a), packing.space_to_depth(b)], [3, 5])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_encoder_matches_unpacked(rng):
    from s2m2_tpu.config import ModelConfig
    from s2m2_tpu.models.init import init_params
    cfg = ModelConfig(feature_channels=32, num_transformer=1)
    p = init_params(cfg, seed=0)["cnn_backbone"]
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 48, 3)), jnp.float32)
    r4, r2 = cnn_encoder_unpacked(p, x)
    g4, g2 = cnn_encoder(p, x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(r4), atol=2e-5)


def test_packed_upsample_mask_4x(rng):
    from s2m2_tpu.config import ModelConfig
    from s2m2_tpu.models.init import init_params
    cfg = ModelConfig(feature_channels=32, num_transformer=1)
    p = init_params(cfg, seed=1)["upsample_mask_4x_refine"]
    feat_x = _rand(rng, (1, 8, 12, 32))
    feat_y = _rand(rng, (1, 16, 24, 32))
    ref = upsample_mask_4x(p, feat_x, feat_y)                 # (B,H,W,9)
    got_p = upsample_mask_4x_packed(p, feat_x, feat_y)        # (B,H/2,W/2,4,9)
    b, hp, wp = got_p.shape[:3]
    got = packing.depth_to_space(got_p.reshape(b, hp, wp, 36))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_upsample_mask_1x(rng):
    from s2m2_tpu.config import ModelConfig
    from s2m2_tpu.models.init import init_params
    cfg = ModelConfig(feature_channels=32, num_transformer=1)
    p = init_params(cfg, seed=2)["upsample_mask_1x"]
    disp = _rand(rng, (1, 32, 48, 1))
    rgb = _rand(rng, (1, 32, 48, 3))
    ctx = _rand(rng, (1, 16, 24, 32))
    ref = upsample_mask_1x(p, disp, rgb, ctx)
    got_p = upsample_mask_1x_packed(
        p, packing.space_to_depth(disp)[..., :], rgb, ctx)
    b, hp, wp = got_p.shape[:3]
    got = packing.depth_to_space(got_p.reshape(b, hp, wp, 36))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_upsample4x(rng):
    disp = _rand(rng, (1, 8, 12, 1))
    occ = _rand(rng, (1, 8, 12, 1))
    mask = _rand(rng, (1, 32, 48, 9))
    ref_d = upsample4x(disp, mask)
    ref_o = upsample4x(occ, mask)
    mask_p = packing.space_to_depth(mask).reshape(1, 16, 24, 4, 9)
    got_p = upsample4x_packed([disp, occ], mask_p)            # (B,Hp,Wp,4,2)
    got = packing.depth_to_space(got_p.reshape(1, 16, 24, 8))
    np.testing.assert_allclose(np.asarray(got[..., 0:1]), np.asarray(ref_d),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[..., 1:2]), np.asarray(ref_o),
                               atol=1e-5)


def test_upsample1x_multi(rng):
    x = _rand(rng, (1, 16, 24, 3))
    filt = _rand(rng, (1, 16, 24, 9))
    ref = [upsample1x(x[..., i:i + 1], filt) for i in range(3)]
    got = upsample1x_multi(x, filt)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(got[..., i:i + 1]),
                                   np.asarray(ref[i]), atol=1e-5)


def test_s2d_slices_variant_exact(rng):
    """The flag-gated strided-slice space_to_depth (S2M2_S2D_SLICES=1 — a
    measured e2e counter-example, see packing.py docstring) stays
    bit-identical to the default reshape form."""
    from s2m2_tpu.models import packing

    x = jnp.asarray(rng.standard_normal((2, 8, 10, 5)), jnp.float32)
    ref = np.asarray(packing.space_to_depth(x))
    packing.set_s2d_slices(True)
    try:
        got = np.asarray(packing.space_to_depth(x))
    finally:
        packing.set_s2d_slices(False)
    np.testing.assert_array_equal(got, ref)


def test_pack_pointwise_s2d_exact(rng):
    """Folding space_to_depth into a 2x2/s2 conv computes the SAME floats
    as conv1x1_blockdiag(space_to_depth(x)) — the packed intermediate never
    materializes."""
    import jax.numpy as jnp
    from s2m2_tpu.models import layers
    from s2m2_tpu.models.packing import (pack_pointwise, pack_pointwise_s2d,
                                         space_to_depth)

    x = jnp.asarray(rng.standard_normal((2, 16, 20, 3)), jnp.float32)
    p = {"weight": jnp.asarray(rng.standard_normal((1, 1, 3, 16)),
                               jnp.float32),
         "bias": jnp.asarray(rng.standard_normal((16,)), jnp.float32)}
    ref = layers.conv2d(pack_pointwise(p), space_to_depth(x))
    got = layers.conv2d(pack_pointwise_s2d(p), x, stride=2, padding=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_encoder_s2d_in_conv_matches(rng):
    """The s2d-in-conv stem equals the default packed stem end-to-end."""
    from s2m2_tpu.config import ModelConfig
    from s2m2_tpu.models import encoder
    from s2m2_tpu.models.init import init_params

    cfg = ModelConfig(feature_channels=32, num_transformer=1)
    params = init_params(cfg, seed=0)["cnn_backbone"]
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)) * 50, jnp.float32)
    ref = encoder.cnn_encoder(params, x)
    encoder.set_s2d_in_conv(True)  # conftest _flag_guard restores
    got = encoder.cnn_encoder(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-5)


def test_upsample_reduce_matches_einsum(rng):
    """S2M2_UP_REDUCE reformulates the convex combinations as fused
    multiply+reduce with the nearest-x2 folded into a weight reshape —
    identical floats to the einsum forms."""
    import jax.numpy as jnp
    from s2m2_tpu.models import upsampling

    b, h, w, c = 2, 8, 10, 3
    xs = [jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
          for _ in range(c)]
    mask = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w, 4, 9)),
                       jnp.float32)
    ref4 = upsampling.upsample4x_packed(xs, mask)
    x_full = jnp.asarray(rng.standard_normal((b, 4 * h, 4 * w, c)),
                         jnp.float32)
    filt = jnp.asarray(rng.standard_normal((b, 4 * h, 4 * w, 9)),
                       jnp.float32)
    ref1 = upsampling.upsample1x_multi(x_full, filt)

    upsampling.set_up_reduce(True)  # conftest _flag_guard restores
    got4 = upsampling.upsample4x_packed(xs, mask)
    got1 = upsampling.upsample1x_multi(x_full, filt)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), atol=1e-6)


def test_up_bf16_weight_storage_bounded(rng):
    """S2M2_UP_BF16_W stores the convex-combination softmax weights bf16
    (fp32 statistics kept). Probabilities are in [0,1] so bf16 rounding is
    <=2^-9 relative; the convex combination of disparities changes by at
    most max|disp| * 9 * 2^-9-ish — bound it empirically."""
    import jax.numpy as jnp
    from s2m2_tpu.models import upsampling

    b, h, w = 1, 8, 10
    xs = [jnp.asarray(rng.uniform(0, 30, (b, h, w, 1)), jnp.float32)]
    mask = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w, 4, 9)),
                       jnp.float32)
    x_full = jnp.asarray(rng.uniform(0, 30, (b, 4 * h, 4 * w, 1)),
                         jnp.float32)
    filt = jnp.asarray(rng.standard_normal((b, 4 * h, 4 * w, 9)), jnp.float32)
    ref4 = np.asarray(upsampling.upsample4x_packed(xs, mask))
    ref1 = np.asarray(upsampling.upsample1x_multi(x_full, filt))
    upsampling.set_up_bf16_w(True)  # conftest _flag_guard restores
    got4 = np.asarray(upsampling.upsample4x_packed(xs, mask))
    got1 = np.asarray(upsampling.upsample1x_multi(x_full, filt))
    assert np.abs(got4 - ref4).max() < 0.15   # px, |disp|<=30 here
    assert np.abs(got1 - ref1).max() < 0.15
