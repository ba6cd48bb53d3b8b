"""Disparity -> depth -> point cloud (reference: model_utils.py:111-136 and
demo/visualize_3d_*.py). open3d-free: pure numpy with optional PLY export;
the open3d viewer is used only when the package is available.
"""
from __future__ import annotations

import numpy as np


def disparity_to_depth(disp, fx, baseline, doffs=0.0, invalid_value=1e9):
    """depth = baseline * fx / (disp + doffs); non-positive disparity ->
    invalid (reference: model_utils.py:124-125)."""
    disp = np.asarray(disp, np.float64)
    depth = baseline * fx / (disp + doffs)
    depth = np.where(disp <= 0, invalid_value, depth)
    return depth.astype(np.float32)


def get_pointcloud(rgb, disp, calib, depth_trunc=None, stride=1,
                   intrinsic_scale=0.5):
    """Backproject to a colored point cloud.

    calib: dict with 'cam0' (3x3 K), 'baseline', 'doffs' (Middlebury
    convention). intrinsic_scale mirrors the reference's half-intrinsics
    (reference: model_utils.py:117-120). Returns (points (N,3), colors (N,3)).
    """
    if depth_trunc is None:
        depth_trunc = 1e9
    K = np.asarray(calib["cam0"])
    fx = K[0, 0] * intrinsic_scale
    cx = K[0, 2] * intrinsic_scale
    cy = K[1, 2] * intrinsic_scale
    depth = disparity_to_depth(disp, fx, calib["baseline"], calib["doffs"])
    # the reference feeds open3d with depth_scale=1000 (mm -> m)
    depth = depth / 1000.0

    h, w = depth.shape
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    z = depth[::stride, ::stride]
    mask = (z > 0) & (z < depth_trunc)
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fx
    pts = np.stack([x[mask], y[mask], z[mask]], axis=-1)
    cols = np.asarray(rgb)[::stride, ::stride][mask] / 255.0
    return pts.astype(np.float32), cols.astype(np.float32)


def save_ply(path, points, colors=None):
    """Write an ASCII PLY file (viewer-agnostic export)."""
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            rgb8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
            for p, c in zip(points, rgb8):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def show_pointcloud(points, colors=None):
    """Interactive viewer if open3d is installed; otherwise no-op with hint."""
    try:
        import open3d as o3d
    except ImportError:
        print("open3d not available — use save_ply() and an external viewer")
        return
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(points)
    if colors is not None:
        pc.colors = o3d.utility.Vector3dVector(colors)
    o3d.visualization.draw_geometries([pc])
