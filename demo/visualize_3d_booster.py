#!/usr/bin/env python
"""Booster 3D demo (reference: demo/visualize_3d_booster.py): OpenCV-XML
calib (proj_matL/baselineLR), 2x-downsampled inference, point cloud."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_booster_calib(calib_path):
    """proj_matL 3x3 + baselineLR; doffs = 0
    (reference: demo/visualize_3d_booster.py:54-61)."""
    import cv2
    fs = cv2.FileStorage(str(calib_path), cv2.FILE_STORAGE_READ)
    calib = {"cam0": fs.getNode("proj_matL").mat(),
             "baseline": float(fs.getNode("baselineLR").real()),
             "doffs": 0.0}
    fs.release()
    return calib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/root/reference/data/samples/Lid")
    ap.add_argument("--model_type", default="XL", choices=["S", "M", "L", "XL"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_refine", type=int, default=3)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32", "int8", "int8a", "int8r"])
    ap.add_argument("--out", default="booster_cloud.ply")
    ap.add_argument("--html", default=None,
                    help="also write a self-contained interactive WebGL "
                         "viewer (open in any browser; no dependencies)")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    import cv2
    from s2m2_tpu.runtime.engine import StereoEngine
    from s2m2_tpu.utils.image import read_images
    from s2m2_tpu.utils.pointcloud import get_pointcloud, save_html_viewer, \
        save_ply, show_pointcloud
    from s2m2_tpu.utils.vis import validity_mask

    calib = read_booster_calib(os.path.join(args.data_dir, "calib.xml"))
    left, right = read_images(os.path.join(args.data_dir, "im0.png"),
                              os.path.join(args.data_dir, "im1.png"))
    # 2x downsample like the reference (demo:76-77)
    left = cv2.resize(left, (0, 0), fx=0.5, fy=0.5)
    right = cv2.resize(right, (0, 0), fx=0.5, fy=0.5)

    eng = StereoEngine(args.model_type, checkpoint=args.checkpoint,
                       precision=args.precision, refine_iter=args.num_refine,
                       use_positivity=True)
    disp, occ, conf, score, ms = eng.run(left, right, n_repeat=5)
    print(f"confidence score: {score:.4f}, runtime {ms:.1f} ms "
          f"({1e3 / ms:.1f} FPS)")

    valid = validity_mask(conf, occ)
    disp_f = disp.copy()
    disp_f[~valid] = -1
    pts, cols = get_pointcloud(left, disp_f, calib, depth_trunc=3.0,
                               intrinsic_scale=0.5)
    save_ply(args.out, pts, cols)
    print(f"saved {len(pts)} points -> {args.out}")
    if args.html:
        save_html_viewer(args.html, pts, cols)
        print(f"interactive viewer -> {args.html}")
    if args.show:
        show_pointcloud(pts, cols)


if __name__ == "__main__":
    main()
