"""Multi-host initialization + mesh construction (SURVEY.md §5.8).

Single slice: `jax.distributed.initialize` wires all hosts into one process
group; the global mesh spans every chip, with the 'data' axis laid out across
hosts (DCN-friendly frame parallelism) and 'band' within a host (ICI-friendly
spatial sharding). On one host this degrades to parallel.mesh.make_mesh.

Scaling ladder (BASELINE.md): 1 chip -> 1 host (band sharding) -> N hosts
(frames over DCN x bands over ICI).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Idempotent jax.distributed.initialize. No-ops for single-process runs
    with no coordinator configured."""
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(n_data=None, n_band=None) -> Mesh:
    """Mesh over ALL devices (all hosts). Defaults: 'data' = number of
    processes (hosts), 'band' = chips per host — so data parallelism rides
    DCN and band sharding rides ICI."""
    devices = jax.devices()
    n_proc = jax.process_count()
    if n_data is None:
        n_data = n_proc
    if n_band is None:
        n_band = len(devices) // n_data
    if n_data * n_band != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_band} != {len(devices)} devices")
    # order devices host-major so 'band' stays within a host's ICI domain
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(n_data, n_band)
    return Mesh(arr, axis_names=("data", "band"))


def scaling_report(per_chip_fps, n_chips, base_fps=None):
    """Scaling-efficiency bookkeeping for the 1-chip/1-host/N-host ladder."""
    total = per_chip_fps * n_chips
    out = {"n_chips": n_chips, "fps_per_chip": per_chip_fps,
           "fps_total": total}
    if base_fps:
        out["scaling_efficiency"] = per_chip_fps / base_fps
    return out
