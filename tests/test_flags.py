"""Central flag registry: snapshot/restore semantics and a toggle-matrix
smoke test (every registered flag flipped once on a tiny forward, parity vs
the default asserted). VERDICT r4 weak #5 / r5 item #6."""
import numpy as np
import jax.numpy as jnp
import pytest

from s2m2_tpu import flags
from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward


def test_registry_covers_known_flags():
    """Every measured-experiment toggle must be registered here — a flag
    added outside the registry escapes the autouse snapshot/restore guard."""
    expected = {"attn_4d", "bf16_scores", "dot_1x1", "fused_block",
                "gn_affine", "int8_acc_bf16", "int8_aligned", "int8_attn",
                "pallas_cross", "pallas_self", "s2d_slices"}
    assert expected <= set(flags.names()), (
        f"missing from registry: {expected - set(flags.names())}")


def test_snapshot_restore_roundtrip():
    snap = flags.snapshot()
    try:
        for n in flags.names():
            flags.set_flag(n, not flags.get(n))
        assert all(flags.get(n) != snap[n] for n in snap)
    finally:
        flags.restore(snap)
    assert all(flags.get(n) == snap[n] for n in snap)


def test_set_unknown_flag_raises():
    with pytest.raises(KeyError):
        flags.set_flag("no_such_flag", True)


@pytest.fixture(scope="module")
def tiny_forward():
    cfg = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)

    def run():
        d, o, c = forward(params, img0, img1, cfg)
        return np.asarray(d), np.asarray(o), np.asarray(c)

    return run


def test_flag_matrix_parity(tiny_forward):
    """Each flag toggled once (non-default) on a tiny fp32 forward: output
    must stay finite and within reassociation-level distance of the default.
    On CPU the Pallas/fused/int8 toggles are inert (backend- or
    context-gated) and the exact-rewrite toggles (attn_4d, s2d_slices,
    dot_1x1, gn_affine) differ only by float reassociation."""
    base = tiny_forward()
    snap = flags.snapshot()
    # PRECISION flags deliberately round a stored tensor (not exact
    # rewrites): allow their documented rounding-level drift. up_bf16_w
    # stores the convex-upsampling softmax weights bf16 even on the fp32
    # path (measured 0.0066 px on this fixture; dedicated bound in
    # tests/test_packing.py::test_up_bf16_weight_storage_bounded).
    tol = {"up_bf16_w": 0.05}
    for name in flags.names():
        try:
            flags.set_flag(name, not snap[name])
            got = tiny_forward()
        finally:
            flags.restore(snap)
        for g, b, tag in zip(got, base, ("disp", "occ", "conf")):
            assert np.isfinite(g).all(), f"{name}: non-finite {tag}"
            np.testing.assert_allclose(
                g, b, atol=tol.get(name, 1e-3),
                err_msg=f"flag {name} changed {tag} beyond tolerance")
