"""Device mesh + sharding layout for S2M2 inference/training.

Parallelism design (new scope vs the reference, which is single-GPU only —
SURVEY.md §2.4/§5.7):

  mesh axes ('data', 'band'):
    * 'data' — data parallelism over frames/stereo pairs (DCN-friendly).
    * 'band' — spatial partitioning of image rows (epipolar bands) within a
      pair (ICI-friendly). Scanline attention and the per-row OT matcher are
      embarrassingly parallel over H, so band sharding needs communication
      only for conv halos and the small 1/32 global-attention bottleneck —
      XLA GSPMD inserts those collectives from the sharding annotations
      (halo exchange for convs, all-gather for bottleneck k/v).

Activations are NHWC with B sharded over 'data' and H over 'band'; parameters
are replicated.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_band: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_band is None:
        n_band = len(devices) // n_data
    n = n_data * n_band
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_data, n_band)
    return Mesh(dev, axis_names=("data", "band"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: B over 'data', H over 'band'."""
    return NamedSharding(mesh, P("data", "band", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
