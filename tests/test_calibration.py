"""Self-calibration optimizers against a synthetic analytic objective.

A fake engine whose confidence peaks at a known extrinsic delta lets us test
the CEM / coordinate-descent search loops end-to-end without the model."""
import numpy as np
import pytest

import s2m2_tpu.calibration.base as base
from s2m2_tpu.calibration.cem import cem_calibration
from s2m2_tpu.calibration.grad_descent import gradient_descent_calibration
from s2m2_tpu.utils.calib import euler_to_rotation_matrix


def _calib_data():
    return {
        "left": {"fx": 800.0, "fy": 800.0, "cx": 320.0, "cy": 240.0,
                 "distortion": np.zeros(5)},
        "right": {"fx": 800.0, "fy": 800.0, "cx": 320.0, "cy": 240.0,
                  "distortion": np.zeros(5)},
        "stereo_extrinsic": {"rotation": np.eye(3),
                             "translation": np.array([-100.0, 0, 0])},
    }


@pytest.fixture
def synthetic_objective(monkeypatch):
    """Patch evaluate_sample: conf = exp(-|delta - target|^2 / s)."""
    target = np.array([0.003, -0.002, 0.001])

    def fake_eval(engine, left, right, calib_data, r, p, y):
        d = np.array([r, p, y]) - target
        return float(np.exp(-(d @ d) / (2 * 0.004 ** 2)))

    monkeypatch.setattr(base, "evaluate_sample", fake_eval)
    import s2m2_tpu.calibration.cem as cem_mod
    import s2m2_tpu.calibration.grad_descent as gd_mod
    monkeypatch.setattr(cem_mod, "evaluate_sample", fake_eval)
    monkeypatch.setattr(gd_mod, "evaluate_sample", fake_eval)
    return target


def test_cem_converges(synthetic_objective):
    target = synthetic_objective
    res = cem_calibration(None, np.zeros((10, 10, 3)), np.zeros((10, 10, 3)),
                          _calib_data(), seed=0, verbose=False)
    found = np.array([res["roll_delta"], res["pitch_delta"], res["yaw_delta"]])
    assert res["final_confidence"] > res["initial_confidence"]
    assert np.linalg.norm(found - target) < np.linalg.norm(target)
    # new calib carries the applied delta
    R_expected = _calib_data()["stereo_extrinsic"]["rotation"] @ \
        euler_to_rotation_matrix(*found)
    np.testing.assert_allclose(
        res["calib_data_new"]["stereo_extrinsic"]["rotation"], R_expected)


def test_gd_improves(synthetic_objective):
    res = gradient_descent_calibration(
        None, np.zeros((10, 10, 3)), np.zeros((10, 10, 3)), _calib_data(),
        verbose=False)
    assert res["final_confidence"] >= res["initial_confidence"]


def test_evaluate_sample_error_returns_zero():
    """Broken calib must degrade to 0.0, not raise (reference: base.py:34-36)."""
    score = base.evaluate_sample(None, np.zeros((8, 8, 3), np.uint8),
                                 np.zeros((8, 8, 3), np.uint8),
                                 {"bad": "calib"}, 0, 0, 0)
    assert score == 0.0
