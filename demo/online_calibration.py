#!/usr/bin/env python
"""Online self-calibration demo (reference: demo/online_calibration.py):
CEM / gradient-descent / keypoint refinement of the stereo extrinsics on a
raw (unrectified) sensor pair."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--left_path",
                    default="/root/reference/data/calib/1_10_sensor_raw_left.png")
    ap.add_argument("--right_path",
                    default="/root/reference/data/calib/1_10_sensor_raw_right.png")
    ap.add_argument("--calib_xml",
                    default="/root/reference/data/calib/1_01_camera_param_head.xml")
    ap.add_argument("--method", default="cem", choices=["cem", "gd", "kp"])
    ap.add_argument("--model_type", default="S", choices=["S", "M", "L", "XL"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32", "int8", "int8a", "int8r"])
    args = ap.parse_args()

    from s2m2_tpu.calibration.cem import cem_calibration
    from s2m2_tpu.calibration.grad_descent import gradient_descent_calibration
    from s2m2_tpu.calibration.keypoint import keypoint_based_calibration
    from s2m2_tpu.runtime.engine import StereoEngine
    from s2m2_tpu.utils.calib import load_calibration_data
    from s2m2_tpu.utils.image import read_images

    left, right = read_images(args.left_path, args.right_path)
    calib = load_calibration_data(args.calib_xml)
    if calib is None:
        sys.exit(1)

    if args.method == "kp":
        result = keypoint_based_calibration(left, right, calib)
    else:
        eng = StereoEngine(args.model_type, checkpoint=args.checkpoint,
                           precision=args.precision)
        fn = cem_calibration if args.method == "cem" \
            else gradient_descent_calibration
        result = fn(eng, left, right, calib)

    if isinstance(result, dict):
        print("\nresult:")
        for k in ("roll_delta", "pitch_delta", "yaw_delta",
                  "initial_confidence", "final_confidence"):
            if k in result:
                print(f"  {k}: {result[k]:+.5f}")


if __name__ == "__main__":
    main()
