"""Calibration math + parsers (host-side numpy/scipy/cv2).

Covers the reference's calibration surface
(reference: src/s2m2/core/utils/calib_utils.py and
xml_calibration_reader.py — which duplicate each other; we keep one copy):

  * XML sensor calibration schema: distorted_{left,right,rgb}_intrinsic
    (fx/fy/cx/cy/dist), stereo_extrinsic R|T, left2rgb R|T.
  * rotation conversions (Euler xyz <-> matrix, axis-angle, small-angle).
  * cv2 stereo rectification (CALIB_ZERO_DISPARITY, alpha=0) + remap maps.

Plus the dataset calib parsers used by the demos:
  * Middlebury calib.txt (cam0/cam1/doffs/baseline)
    (reference: demo/visualize_3d_middlebury.py:54-69)
  * OpenCV FileStorage calib.xml (Booster)
    (reference: demo/visualize_3d_booster.py:54-61)
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


# --- rotation helpers -------------------------------------------------------

def euler_to_rotation_matrix(roll, pitch, yaw):
    from scipy.spatial.transform import Rotation as R
    return R.from_euler("xyz", [roll, pitch, yaw]).as_matrix()


def rotation_matrix_to_euler(rot):
    from scipy.spatial.transform import Rotation as R
    return R.from_matrix(rot).as_euler("xyz")


def axis_angle_to_rotation_matrix(axis, angle):
    from scipy.spatial.transform import Rotation as R
    return R.from_rotvec(np.asarray(axis) * angle).as_matrix()


def create_delta_rotation(roll_delta=0.0, pitch_delta=0.0, yaw_delta=0.0):
    return euler_to_rotation_matrix(roll_delta, pitch_delta, yaw_delta)


def apply_delta_rotation(original_R, delta_R):
    return original_R @ delta_R


def small_angle_rotation_to_matrix(delta_angles):
    r, p, y = delta_angles
    return np.array([[1.0, -y, p], [y, 1.0, -r], [-p, r, 1.0]])


def validate_rotation_matrix(R):
    if np.shape(R) != (3, 3):
        return False
    return (np.allclose(R @ np.transpose(R), np.eye(3), atol=1e-6)
            and np.isclose(np.linalg.det(R), 1.0, atol=1e-6))


# --- XML sensor calibration -------------------------------------------------

def _floats(text):
    return np.array([float(x.strip()) for x in text.split(",")])


def parse_xml_calibration(calib_xml_path):
    tree = ET.parse(calib_xml_path)
    root = tree.getroot()
    out = {}
    for name in ("left", "right", "rgb"):
        node = root.find(f"distorted_{name}_intrinsic")
        out[name] = {
            "fx": float(node.find("fx").text),
            "fy": float(node.find("fy").text),
            "cx": float(node.find("cx").text),
            "cy": float(node.find("cy").text),
            "distortion": _floats(node.find("dist").text),
        }
    for name in ("stereo_extrinsic", "left2rgb"):
        node = root.find(name)
        out[name] = {
            "rotation": _floats(node.find("rotation").text).reshape(3, 3),
            "translation": _floats(node.find("translation").text),
        }
    return out


def load_calibration_data(calib_xml_path):
    if not os.path.exists(calib_xml_path):
        print(f"XML calibration file not found: {calib_xml_path}")
        return None
    try:
        return parse_xml_calibration(calib_xml_path)
    except Exception as e:  # tolerant loader, reference: calib_utils.py:20-22
        print(f"Error loading calibration data: {e}")
        return None


def build_camera_matrix(fx, fy, cx, cy):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def compute_stereo_rectification(calibration_data, image_size, delta_R=None):
    """cv2.stereoRectify(CALIB_ZERO_DISPARITY, alpha=0) + undistort-rectify
    maps. image_size is (width, height)."""
    import cv2
    K1 = build_camera_matrix(**{k: calibration_data["left"][k]
                                for k in ("fx", "fy", "cx", "cy")})
    K2 = build_camera_matrix(**{k: calibration_data["right"][k]
                                for k in ("fx", "fy", "cx", "cy")})
    D1 = calibration_data["left"]["distortion"]
    D2 = calibration_data["right"]["distortion"]
    R = np.asarray(calibration_data["stereo_extrinsic"]["rotation"], np.float64)
    T = np.asarray(calibration_data["stereo_extrinsic"]["translation"],
                   np.float64).reshape(3, 1)  # cv2 >= 5 requires a column vec
    if delta_R is not None:
        R = R @ delta_R
    R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, image_size, R, T,
        flags=cv2.CALIB_ZERO_DISPARITY, alpha=0.0)
    leftMapX, leftMapY = cv2.initUndistortRectifyMap(
        K1, D1, R1, P1, image_size, cv2.CV_32FC1)
    rightMapX, rightMapY = cv2.initUndistortRectifyMap(
        K2, D2, R2, P2, image_size, cv2.CV_32FC1)
    return {"K1": K1, "D1": D1, "K2": K2, "D2": D2, "R": R, "T": T,
            "R1": R1, "R2": R2, "P1": P1, "P2": P2, "Q": Q,
            "leftMapX": leftMapX, "leftMapY": leftMapY,
            "rightMapX": rightMapX, "rightMapY": rightMapY}


# --- dataset calibration parsers -------------------------------------------

def read_middlebury_calib(path):
    """Middlebury calib.txt: cam0/cam1 3x3 matrices, doffs, baseline, dims
    (reference: demo/visualize_3d_middlebury.py:54-69)."""
    calib = {}
    with open(path) as f:
        for line in f:
            if "=" not in line:
                continue
            key, val = line.strip().split("=", 1)
            if val.startswith("["):
                rows = val.strip("[]").split(";")
                mat = np.array([[float(x) for x in r.split()] for r in rows])
                calib[key] = mat
            else:
                try:
                    calib[key] = float(val)
                except ValueError:
                    calib[key] = val
    return calib


def read_opencv_calib_xml(path):
    """Booster-style calib.xml via cv2.FileStorage
    (reference: demo/visualize_3d_booster.py:54-61)."""
    import cv2
    fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_READ)
    out = {}
    for key in ("M1", "M2", "D1", "D2", "R", "T", "baseline", "doffs",
                "mtxL", "mtxR"):
        node = fs.getNode(key)
        if node.empty():
            continue
        out[key] = node.mat() if node.isMap() or node.mat() is not None else node.real()
    fs.release()
    return out
