"""Pallas scanline attention kernels vs the XLA reference path
(interpret mode on CPU; the same kernels compile on TPU)."""
import numpy as np
import jax.numpy as jnp

from s2m2_tpu.models.attention import sdpa, set_use_pallas
from s2m2_tpu.ops.flash_attention import (scanline_attention,
                                          scanline_cross_attention)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_scanline_attention_matches_sdpa(rng):
    set_use_pallas(False)
    try:
        b, n, d = 6, 48, 32
        q, k, v = (_rand(rng, b, n, d) for _ in range(3))
        ref = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
        got = scanline_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
    finally:
        set_use_pallas(None)


def test_scanline_cross_matches_two_sdpa(rng):
    set_use_pallas(False)
    try:
        b, n, d = 4, 40, 16
        qx, kx, vx, qy, ky, vy = (_rand(rng, b, n, d) for _ in range(6))
        rx = sdpa(qx[:, None], ky[:, None], vy[:, None])[:, 0]
        ry = sdpa(qy[:, None], kx[:, None], vx[:, None])[:, 0]
        gx, gy = scanline_cross_attention(qx, kx, vx, qy, ky, vy,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry), atol=2e-5)
    finally:
        set_use_pallas(None)


def test_bf16_path(rng):
    set_use_pallas(False)
    try:
        b, n, d = 3, 32, 64
        q, k, v = (_rand(rng, b, n, d).astype(jnp.bfloat16) for _ in range(3))
        ref = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
        got = scanline_attention(q, k, v, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2)
    finally:
        set_use_pallas(None)


def test_cross_attn_packed_pallas_dispatch_multihead(monkeypatch):
    """The module-level Pallas dispatch path (cross_attn_packed) must fold
    per-view (b0, h, n, d) tensors correctly at num_heads > 1 — regression
    for a reshape that used the full packed batch size."""
    import functools
    import unittest.mock as um

    import s2m2_tpu.models.attention as A
    from s2m2_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    p = {"q": {"weight": r(8, 8)}, "k": {"weight": r(8, 8)},
         "v": {"weight": r(8, 8), "bias": jnp.zeros(8)},
         "proj": {"weight": r(8, 8)}}
    ref = A.cross_attn(p, x, y, 2)

    A.set_use_pallas(cross_attn=True)  # conftest _flag_guard restores
    fake = um.MagicMock(scanline_cross_attention=functools.partial(
        fa.scanline_cross_attention, interpret=True))
    monkeypatch.setattr(A, "_fa", fake)
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    got = A.cross_attn(p, x, y, 2)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
