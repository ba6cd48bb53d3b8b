"""Model-free keypoint-based calibration
(reference: src/s2m2/calibration/keypoint_matching.py).

SIFT detect/describe + BF-KNN with Lowe ratio 0.75, >=10 matches required,
essential-matrix RANSAC + recoverPose, delta Euler vs the XML rotation.
Never calls the stereo model.
"""
from __future__ import annotations

import copy

import numpy as np

from ..utils.calib import rotation_matrix_to_euler


def keypoint_based_calibration(left, right, calib_data, *, verbose=True):
    import cv2
    log = print if verbose else (lambda *a, **k: None)

    left_gray = (cv2.cvtColor(left, cv2.COLOR_BGR2GRAY)
                 if left.ndim == 3 else left)
    right_gray = (cv2.cvtColor(right, cv2.COLOR_BGR2GRAY)
                  if right.ndim == 3 else right)

    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(left_gray, None)
    kp2, des2 = sift.detectAndCompute(right_gray, None)
    if des1 is None or des2 is None:
        log("Failed to detect keypoints in one or both images")
        return calib_data["stereo_extrinsic"]["rotation"]

    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=False)
    matches = bf.knnMatch(des1, des2, k=2)
    good = [m for m, n in matches if m.distance < 0.75 * n.distance]
    log(f"Good matches: {len(good)}")
    if len(good) < 10:
        log("Not enough good matches for calibration")
        return calib_data["stereo_extrinsic"]["rotation"]

    pts1 = np.float32([kp1[m.queryIdx].pt for m in good])
    pts2 = np.float32([kp2[m.trainIdx].pt for m in good])

    lc = calib_data["left"]
    K = np.array([[lc["fx"], 0, lc["cx"]], [0, lc["fy"], lc["cy"]],
                  [0, 0, 1]])
    E, _ = cv2.findEssentialMat(pts1, pts2, K, method=cv2.RANSAC, prob=0.999,
                                threshold=1.0)
    if E is None:
        log("Failed to compute essential matrix")
        return calib_data["stereo_extrinsic"]["rotation"]

    _, R, _, _ = cv2.recoverPose(E, pts1, pts2, K)
    original_R = calib_data["stereo_extrinsic"]["rotation"]
    delta_R = R @ original_R.T
    roll_delta, pitch_delta, yaw_delta = rotation_matrix_to_euler(delta_R)
    log(f"Deltas - roll {roll_delta:.4f} pitch {pitch_delta:.4f} "
        f"yaw {yaw_delta:.4f}")

    calib_data_new = copy.deepcopy(calib_data)
    calib_data_new["stereo_extrinsic"]["rotation"] = R
    return {"roll_delta": roll_delta, "pitch_delta": pitch_delta,
            "yaw_delta": yaw_delta, "calib_data_new": calib_data_new}
