"""Distributed helpers (single-process degradation paths)."""
import pytest

from s2m2_tpu.parallel.distributed import (global_mesh, initialize_distributed,
                                           scaling_report)


def test_initialize_noop_single_process():
    assert initialize_distributed() is False


def test_global_mesh_covers_all_devices():
    mesh = global_mesh(n_data=2, n_band=4)
    assert mesh.axis_names == ("data", "band")
    assert mesh.devices.shape == (2, 4)


def test_global_mesh_rejects_bad_shape():
    with pytest.raises(ValueError):
        global_mesh(n_data=3, n_band=4)


def test_scaling_report():
    rep = scaling_report(per_chip_fps=2.5, n_chips=8, base_fps=2.75)
    assert rep["fps_total"] == 20.0
    assert abs(rep["scaling_efficiency"] - 2.5 / 2.75) < 1e-9
