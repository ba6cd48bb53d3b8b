"""StableHLO export round-trip: serialize, reload, numeric parity."""
import numpy as np
import jax.numpy as jnp

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward
from s2m2_tpu.tools.export import (artifact_name, export_forward,
                                   load_artifact, save_artifact)


def test_export_roundtrip(tmp_path, rng):
    cfg = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    params = init_params(cfg, seed=0)
    h, w = 64, 96

    blob = export_forward(params, cfg, h, w, compute_dtype=jnp.float32)
    path = tmp_path / artifact_name(cfg, h, w, "fp32")
    save_artifact(str(path), blob)
    assert path.stat().st_size > 1000

    fn = load_artifact(str(path))
    img0 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    disp, occ, conf = fn(img0, img1)
    ref = forward(params, jnp.asarray(img0), jnp.asarray(img1), cfg)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref[0]), atol=1e-4)
    assert disp.shape == (1, h, w, 1)


def test_stablehlo_mlir_bridge():
    """The cross-backend MLIR module is emitted as valid StableHLO text
    with the expected static-shape entry signature."""
    from s2m2_tpu.tools.export import export_stablehlo_mlir

    cfg = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    params = init_params(cfg, seed=0)
    mlir = export_stablehlo_mlir(params, cfg, 32, 64,
                                 compute_dtype=jnp.float32)
    assert "stablehlo." in mlir          # real StableHLO ops
    assert "tensor<1x32x64x3xf32>" in mlir   # static entry shape
    assert "module @" in mlir


def test_export_with_weights_roundtrip(tmp_path, rng):
    """Weights-as-arguments artifact: module is weight-free; params are
    supplied at call time (the XL-scale export route)."""
    from s2m2_tpu.tools.export import export_forward_with_weights

    cfg = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    params = init_params(cfg, seed=0)
    h, w = 64, 96

    blob = export_forward_with_weights(cfg, h, w, compute_dtype=jnp.float32)
    path = tmp_path / "weightfree.stablehlo"
    save_artifact(str(path), blob)

    fn = load_artifact(str(path))
    img0 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    disp, occ, conf = fn(params, img0, img1)
    ref = forward(params, jnp.asarray(img0), jnp.asarray(img1), cfg)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref[0]), atol=1e-4)


def test_export_with_weights_scales_to_xl():
    """XL-scale export is program-text only (no 812 MB constant blob): the
    constant-embedded route is documented as blocked at XL (axon HTTP 413,
    CLAUDE.md); this artifact stays small because weights are arguments."""
    from s2m2_tpu.config import get_config
    from s2m2_tpu.tools.export import export_forward_with_weights

    cfg = get_config("XL")
    blob = export_forward_with_weights(cfg, 1024, 1216)
    # 406M bf16 params would be ~812 MB; the weight-free module is ~MBs
    assert len(blob) < 64 * 1024 * 1024, len(blob)


def test_export_quantized_roundtrip(tmp_path, rng):
    """int8 engine export: calibrated scales bake into the module, the
    pre-quantized weight tree rides as arguments, and the artifact
    reproduces the live engine's outputs exactly."""
    from s2m2_tpu.tools.export import export_quantized_forward
    from s2m2_tpu.runtime.engine import StereoEngine
    from s2m2_tpu.utils.image import image_pad

    cfg = ModelConfig(feature_channels=32, num_transformer=1, refine_iter=1)
    h, w = 64, 96
    eng = StereoEngine(cfg, precision="int8", seed=0)
    img0 = image_pad(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    img1 = image_pad(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    eng.calibrate(img0, img1)
    ref = eng.forward_padded(img0, img1)

    blob = export_quantized_forward(eng, img0.shape[1], img0.shape[2])
    path = tmp_path / artifact_name(cfg, h, w, "int8")
    save_artifact(str(path), blob)

    fn = load_artifact(str(path))
    disp, occ, conf = fn(eng._run_params, img0, img1)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref[0]),
                               atol=1e-4)

    # an uncalibrated engine is rejected with a clear error
    import pytest
    with pytest.raises(ValueError, match="calibrated"):
        export_quantized_forward(StereoEngine(cfg, precision="int8"), h, w)
