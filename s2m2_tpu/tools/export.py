"""AOT export/serving: jax.export -> serialized StableHLO artifacts.

TPU-native replacement for the reference's ONNX/TensorRT path
(reference: src/s2m2/tools/export_model.py, demo/export_tensorrt.py):
one artifact per (variant, height, width, precision), static shapes —
mirroring the reference's static-shape ONNX constraint — loadable without the
model source and runnable on any device with a compatible PJRT plugin.
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
