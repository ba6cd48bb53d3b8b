#!/usr/bin/env python
"""Training demo (new scope — reference ships no training): fit S2M2 on
synthetic stereo scenes or a Middlebury-style directory, with sharding and
orbax checkpoints."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default=None,
                    help="S/M/L/XL; default = tiny debug config")
    ap.add_argument("--data_root", default=None,
                    help="Middlebury-style scene dir; default synthetic")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--mesh", default=None,
                    help="'DATAxBAND', e.g. 2x4 (needs that many devices)")
    args = ap.parse_args()

    from s2m2_tpu.config import ModelConfig, get_config
    from s2m2_tpu.train.data import directory_batches, synthetic_stereo_batches
    from s2m2_tpu.train.trainer import train

    cfg = (get_config(args.model_type) if args.model_type
           else ModelConfig(feature_channels=32, num_transformer=1,
                            refine_iter=1))
    if args.data_root:
        batches = directory_batches(args.data_root, batch=args.batch,
                                    crop=(args.height, args.width))
    else:
        batches = synthetic_stereo_batches(batch=args.batch,
                                           height=args.height,
                                           width=args.width)
    mesh = None
    if args.mesh:
        from s2m2_tpu.parallel.mesh import make_mesh
        nd, nb = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh(n_data=nd, n_band=nb)

    train(cfg, batches, num_steps=args.steps, lr=args.lr, mesh=mesh,
          checkpoint_dir=args.checkpoint_dir)


if __name__ == "__main__":
    main()
