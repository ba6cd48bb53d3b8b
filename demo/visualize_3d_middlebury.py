#!/usr/bin/env python
"""Middlebury 3D demo (reference: demo/visualize_3d_middlebury.py):
parse calib.txt, run stereo, back-project to a point cloud (PLY / open3d)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir",
                    default="/root/reference/data/samples/Bicycle2")
    ap.add_argument("--model_type", default="L", choices=["S", "M", "L", "XL"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_refine", type=int, default=3)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32", "int8", "int8a", "int8r"])
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--out", default="middlebury_cloud.ply")
    ap.add_argument("--html", default=None,
                    help="also write a self-contained interactive WebGL "
                         "viewer (open in any browser; no dependencies)")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    from s2m2_tpu.runtime.engine import StereoEngine
    from s2m2_tpu.utils.calib import read_middlebury_calib
    from s2m2_tpu.utils.image import read_images
    from s2m2_tpu.utils.pointcloud import get_pointcloud, save_html_viewer, \
        save_ply, show_pointcloud

    calib = read_middlebury_calib(os.path.join(args.data_dir, "calib.txt"))
    left, right = read_images(os.path.join(args.data_dir, "im0.png"),
                              os.path.join(args.data_dir, "im1.png"))
    if args.downscale > 1:
        left = left[::args.downscale, ::args.downscale]
        right = right[::args.downscale, ::args.downscale]

    eng = StereoEngine(args.model_type, checkpoint=args.checkpoint,
                       precision=args.precision, refine_iter=args.num_refine,
                       use_positivity=True)
    disp, occ, conf, score, ms = eng.run(left, right)
    print(f"confidence score: {score:.4f}, runtime {ms:.1f} ms")

    disp_full = disp * args.downscale  # disparity scales with resolution
    pts, cols = get_pointcloud(left, disp_full, calib,
                               intrinsic_scale=0.5 / args.downscale)
    save_ply(args.out, pts, cols)
    print(f"saved {len(pts)} points -> {args.out}")
    if args.html:
        save_html_viewer(args.html, pts, cols)
        print(f"interactive viewer -> {args.html}")
    if args.show:
        show_pointcloud(pts, cols)


if __name__ == "__main__":
    main()
