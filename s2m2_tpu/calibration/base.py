"""Shared self-calibration objective (reference: src/s2m2/calibration/base.py).

The frozen stereo model is a black-box fitness function: apply a candidate
delta rotation to the extrinsics, re-rectify on the host (cv2), and score the
pair by the engine's interior mean confidence. Exceptions degrade to 0.0 so
stochastic searches survive bad samples (reference: base.py:34-36).

The engine argument is any object with `.confidence_score(left, right)` —
normally s2m2_tpu.runtime.engine.StereoEngine (the jitted TPU model).
"""
from __future__ import annotations

from ..utils.calib import compute_stereo_rectification, create_delta_rotation
from ..utils.image import rectify_images


def evaluate_sample(engine, left, right, calib_data, roll_delta, pitch_delta,
                    yaw_delta):
    """Confidence of the pair under a (roll, pitch, yaw) extrinsic delta."""
    h, w = left.shape[:2]
    try:
        delta_R = create_delta_rotation(roll_delta, pitch_delta, yaw_delta)
        rect = compute_stereo_rectification(calib_data, (w, h), delta_R)
        left_r, right_r = rectify_images(left, right, rect)
        score = engine.confidence_score(left_r, right_r)
        return score if score is not None else 0.0
    except Exception as e:
        print(f"Error evaluating sample: {e}")
        return 0.0
