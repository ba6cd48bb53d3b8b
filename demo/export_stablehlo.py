#!/usr/bin/env python
"""Export a (variant, resolution, precision) StableHLO artifact and verify it
by reloading + running on a sample pair (reference: demo/export_onnx.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="S", choices=["S", "M", "L", "XL"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--num_refine", type=int, default=3)
    ap.add_argument("--out_dir", default="artifacts")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and run a random pair")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from s2m2_tpu.config import get_config
    from s2m2_tpu.models.init import init_params
    from s2m2_tpu.tools.convert_checkpoint import load_npz
    from s2m2_tpu.tools.export import (artifact_name, export_forward,
                                       load_artifact, save_artifact)

    cfg = get_config(args.model_type, refine_iter=args.num_refine)
    params = (load_npz(args.checkpoint) if args.checkpoint
              else init_params(cfg, seed=0))
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    # pad resolution to /32 like the runtime does
    h = -(-args.height // 32) * 32
    w = -(-args.width // 32) * 32
    blob = export_forward(params, cfg, h, w, compute_dtype=dtype)
    path = os.path.join(args.out_dir, artifact_name(cfg, h, w, args.precision))
    save_artifact(path, blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {path}")

    if args.verify:
        fn = load_artifact(path)
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
        disp, occ, conf = fn(img, img)
        print(f"verify: disp {disp.shape} range "
              f"[{float(disp.min()):.2f}, {float(disp.max()):.2f}]")


if __name__ == "__main__":
    main()
