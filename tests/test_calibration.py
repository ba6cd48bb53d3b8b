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


def test_keypoint_estimate_rotation_synthetic():
    """estimate_rotation recovers a known relative pose from exact
    synthetic correspondences (3D cloud projected through two cameras)."""
    from s2m2_tpu.calibration.keypoint import estimate_rotation

    rng = np.random.default_rng(0)
    K = np.array([[800.0, 0, 320.0], [0, 800.0, 240.0], [0, 0, 1.0]])
    R_true = euler_to_rotation_matrix(0.02, -0.01, 0.015)
    t = np.array([-1.0, 0.02, 0.01])
    pts3d = np.c_[rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200),
                  rng.uniform(4, 12, 200)]

    def project(P, R, t):
        cam = P @ R.T + t
        uv = cam[:, :2] / cam[:, 2:3]
        return (uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)

    pts1 = project(pts3d, np.eye(3), np.zeros(3))
    pts2 = project(pts3d, R_true, t)
    R_est, err = estimate_rotation(pts1, pts2, K)
    assert err is None
    # recoverPose convention matches the generator's world->cam rotation
    np.testing.assert_allclose(R_est, R_true, atol=1e-3)


def test_keypoint_calibration_uniform_contract():
    """Every exit path returns the same dict schema (the reference returned
    a bare rotation matrix on failure — redesigned away)."""
    from s2m2_tpu.calibration.keypoint import keypoint_based_calibration

    calib = _calib_data()
    # blank images: no keypoints -> failure dict, zero deltas, calib unchanged
    blank = np.zeros((64, 64), np.uint8)
    res = keypoint_based_calibration(blank, blank, calib, verbose=False)
    assert res["success"] is False and res["roll_delta"] == 0.0
    np.testing.assert_array_equal(
        res["calib_data_new"]["stereo_extrinsic"]["rotation"],
        calib["stereo_extrinsic"]["rotation"])

    # textured pair with pure horizontal shift: success, near-zero rotation
    rng = np.random.default_rng(1)
    import cv2
    tex = cv2.GaussianBlur(
        rng.integers(0, 255, (240, 320), dtype=np.uint8), (0, 0), 1.5)
    left = tex
    right = np.roll(tex, -7, axis=1)
    res2 = keypoint_based_calibration(left, right, calib, verbose=False)
    assert set(res2) == set(res)
    if res2["success"]:  # SIFT found enough matches
        assert res2["num_matches"] >= 10
        R = res2["calib_data_new"]["stereo_extrinsic"]["rotation"]
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
        # (planar pure-shift data is pose-degenerate, so the recovered
        # rotation itself isn't asserted here — accuracy is pinned by
        # test_keypoint_estimate_rotation_synthetic on exact 3D geometry)


def test_render_calibration_comparison():
    """Headless before/after panel: runs the engine twice, composes epipolar
    overlays + disparity/confidence rows into one uint8 image."""
    from s2m2_tpu.calibration.visualize import render_calibration_comparison
    from s2m2_tpu.config import ModelConfig
    from s2m2_tpu.runtime.engine import StereoEngine

    rng = np.random.default_rng(3)
    eng = StereoEngine(ModelConfig(feature_channels=16, num_transformer=1,
                                   refine_iter=1), precision="fp32")
    imgs = [rng.uniform(0, 255, (40, 64, 3)).astype(np.float32)
            for _ in range(4)]
    panel, sb, sa = render_calibration_comparison(eng, *imgs, num_lines=4)
    assert panel.dtype == np.uint8 and panel.ndim == 3
    assert panel.shape[1] >= 2 * 64  # side-by-side rows
    assert np.isfinite(sb) and np.isfinite(sa)
