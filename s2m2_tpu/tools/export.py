"""AOT export/serving: jax.export -> serialized StableHLO artifacts.

TPU-native replacement for the reference's ONNX/TensorRT path
(reference: src/s2m2/tools/export_model.py, demo/export_tensorrt.py):
one artifact per (variant, height, width, precision), static shapes —
mirroring the reference's static-shape ONNX constraint — loadable without the
model source and runnable on any device with a compatible PJRT plugin.

Cross-backend interop (conscious trade vs the reference's ONNX): the
reference exports opset-18 ONNX consumable by non-NVIDIA runtimes; this
framework's portable interchange format is StableHLO instead. Non-JAX
consumers have two supported routes:
  * `export_stablehlo_mlir` emits the raw versioned StableHLO MLIR module —
    the openxla interchange format consumed by IREE, XLA:CPU/GPU/TPU via
    PJRT, TensorFlow (tf.XlaCallModule / SavedModel), and the
    onnx-mlir/stablehlo converter ecosystems.
  * `export_forward` emits jax.export bytes for PJRT runtimes.
ONNX itself is NOT emitted: torch.onnx cannot trace a JAX model, and a
hand-written ONNX graph would be a second model implementation to keep in
parity — the StableHLO module carries the same static-shape contract the
reference chose for its ONNX path.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..config import ModelConfig
from ..models.s2m2 import forward


def export_forward(params, cfg: ModelConfig, height: int, width: int,
                   batch: int = 1, compute_dtype=jnp.bfloat16):
    """Serialize the jitted forward at a static shape. Returns bytes."""
    params = jax.tree.map(lambda x: x.astype(compute_dtype), params)

    def fn(img0, img1):
        disp, occ, conf = forward(params, img0.astype(compute_dtype),
                                  img1.astype(compute_dtype), cfg)
        return (disp.astype(jnp.float32), occ.astype(jnp.float32),
                conf.astype(jnp.float32))

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec, spec)
    return exported.serialize()


def export_stablehlo_mlir(params, cfg: ModelConfig, height: int, width: int,
                          batch: int = 1,
                          compute_dtype=jnp.bfloat16) -> str:
    """Emit the model as a portable StableHLO MLIR module (text).

    This is the cross-backend bridge (see module docstring): any StableHLO
    consumer — IREE, TF XlaCallModule, PJRT backends — can compile this
    module without JAX or the model source.

    Size limitation: parameters are embedded as inline constants in TEXTUAL
    MLIR — fine for S (and the artifact tests), multi-GB of text at XL.
    For large variants use export_forward_with_weights (weight-free module +
    a .npz checkpoint) instead.
    """
    params = jax.tree.map(lambda x: x.astype(compute_dtype), params)

    def fn(img0, img1):
        disp, occ, conf = forward(params, img0.astype(compute_dtype),
                                  img1.astype(compute_dtype), cfg)
        return (disp.astype(jnp.float32), occ.astype(jnp.float32),
                conf.astype(jnp.float32))

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec, spec)
    return exported.mlir_module()


def export_forward_with_weights(cfg: ModelConfig, height: int, width: int,
                                batch: int = 1,
                                compute_dtype=jnp.bfloat16):
    """Weights-as-ARGUMENTS export: the artifact takes (params, img0, img1).

    The constant-embedded exports above are self-contained (the TRT-engine
    analog) but bake the parameter tree into the module — at XL that is
    812 MB of bf16 constants, which exceeds the axon remote-compile request
    limit (HTTP 413, CLAUDE.md) and bloats the artifact. This variant keeps
    the module weight-free (a few MB even at XL — only program text), the
    same way the engine passes params as jit arguments; pair the artifact
    with a converted .npz checkpoint at load time. Returns bytes.
    """
    def fn(params, img0, img1):
        params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
        disp, occ, conf = forward(params, img0.astype(compute_dtype),
                                  img1.astype(compute_dtype), cfg)
        return (disp.astype(jnp.float32), occ.astype(jnp.float32),
                conf.astype(jnp.float32))

    from ..models.init import init_params
    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, compute_dtype),
        jax.eval_shape(lambda: init_params(cfg, seed=0)))
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(p_spec, spec, spec)
    return exported.serialize()


def save_artifact(path: str, blob: bytes):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_artifact(path: str):
    """Deserialize an exported artifact; returns a callable(img0, img1)."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)


def artifact_name(cfg: ModelConfig, height: int, width: int,
                  precision: str = "bf16") -> str:
    return f"s2m2_CH{cfg.feature_channels}NTR{cfg.num_transformer}" \
           f"_{width}x{height}_{precision}.stablehlo"


def export_quantized_forward(engine, height: int, width: int, batch: int = 1):
    """Export a CALIBRATED int8/int8a/int8r engine's forward — the
    TRT-int8-engine analog (reference builds int8 TensorRT engines from a
    calibration cache; here the static per-site scales bake into the module
    as constants and the PRE-QUANTIZED weight tree rides as arguments, so
    the artifact stays weight-free even at XL).

    The artifact takes (quantized_params, img0, img1) where
    quantized_params is the engine's post-calibration `_run_params` tree
    (int8 weight leaves + fp32 'w_scale' siblings; persist it with the
    checkpoint tools or regenerate via quant.quantize_params_tree +
    load_calibration). Returns bytes.
    """
    from ..models import quant

    if not getattr(engine, "quantize", False) or engine.quant_scales is None:
        raise ValueError("export_quantized_forward needs a calibrated "
                         "int8/int8a/int8r StereoEngine")
    cfg = engine.cfg
    scales = tuple(float(s) for s in engine.quant_scales)
    aligned = engine.quant_aligned
    residency = engine.quant_residency
    cdt = engine.compute_dtype

    def fn(qparams, img0, img1):
        with quant.quantized(scales, aligned=aligned, skip_fp32=True,
                             residency=residency):
            disp, occ, conf = forward(qparams, img0.astype(cdt),
                                      img1.astype(cdt), cfg)
        return (disp.astype(jnp.float32), occ.astype(jnp.float32),
                conf.astype(jnp.float32))

    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        engine._run_params)
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(p_spec, spec, spec)
    return exported.serialize()
