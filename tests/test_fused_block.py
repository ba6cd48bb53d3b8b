"""Fused BasicAttnBlock kernel vs the unfused XLA path (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from s2m2_tpu.models.attention import basic_attn_block
from s2m2_tpu.models.init import _basic_attn_block, _Rng
from s2m2_tpu.ops.fused_block import fused_basic_attn_block


@pytest.mark.parametrize("heads,c,e", [(1, 16, 1), (2, 16, 1), (1, 8, 2)])
def test_fused_matches_unfused(rng, heads, c, e):
    p = _basic_attn_block(_Rng(0), c, heads, e)
    b, h, w = 2, 3, 24
    z = jnp.asarray(rng.standard_normal((2 * b, h, w, c)).astype(np.float32))
    ref = basic_attn_block(p, z, heads)
    got = fused_basic_attn_block(p, z, num_heads=heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_bf16(rng):
    p = _basic_attn_block(_Rng(1), 16, 1, 1)
    z = jnp.asarray(rng.standard_normal((2, 2, 16, 16)).astype(np.float32))
    zb = z.astype(jnp.bfloat16)
    ref = basic_attn_block(p, zb, 1)
    got = fused_basic_attn_block(p, zb, num_heads=1, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)
