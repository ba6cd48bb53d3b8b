#!/usr/bin/env python
"""2D stereo demo — the main entry (reference: demo/visualize_2d_simple.py).

Runs a stereo pair through the engine, prints the confidence score and
runtime, and saves (or shows) the result panel.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--left_path",
                    default="/root/reference/data/samples/Web/0025_L.png")
    ap.add_argument("--right_path",
                    default="/root/reference/data/samples/Web/0025_R.png")
    ap.add_argument("--model_type", default="S", choices=["S", "M", "L", "XL"])
    ap.add_argument("--checkpoint", default=None,
                    help=".npz converted checkpoint (tools/convert_checkpoint)")
    ap.add_argument("--num_refine", type=int, default=3)
    ap.add_argument("--allow_negative", action="store_true")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32", "int8", "int8a", "int8r"])
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--n_repeat", type=int, default=5)
    ap.add_argument("--out", default="result_2d.png")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    from s2m2_tpu.runtime.engine import StereoEngine
    from s2m2_tpu.utils.image import read_images
    from s2m2_tpu.utils.vis import render_results_2d, show_results_2d

    left, right = read_images(args.left_path, args.right_path)
    if args.downscale > 1:
        left = left[::args.downscale, ::args.downscale]
        right = right[::args.downscale, ::args.downscale]
    # crop to /32 multiples like the reference demo (demo:56-62)
    h, w = left.shape[:2]
    left = left[: h // 32 * 32, : w // 32 * 32]
    right = right[: h // 32 * 32, : w // 32 * 32]

    eng = StereoEngine(args.model_type, checkpoint=args.checkpoint,
                       precision=args.precision, refine_iter=args.num_refine,
                       use_positivity=not args.allow_negative)
    disp, occ, conf, score, ms = eng.run(left, right, n_repeat=args.n_repeat)
    print(f"confidence score: {score:.4f}")
    print(f"runtime: {ms:.1f} ms ({1e3 / ms:.1f} FPS)")
    print(f"disparity range: [{disp.min():.2f}, {disp.max():.2f}]")

    if args.show:
        show_results_2d(left, disp, occ, conf)
    else:
        import cv2
        panel = render_results_2d(left, disp, occ, conf)
        cv2.imwrite(args.out, panel)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
