"""Per-instruction physical-traffic breakdown of the CNN encoder stage
(dev tool; compile-only — never touches the TPU server).

Round-4 question: the encoder is the one stage visibly below its physical
roofline (44.5 ms measured vs 33.0 ms phys = 74%), and its padding tax is
the largest (1.92x). Where do the padded bytes sit, and is any of it
addressable from JAX (layout-friendly rewrites) rather than
compiler-internal?
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections

import numpy as np
import jax
import jax.numpy as jnp

from probe_refine_hlo import parse_entry  # noqa: E402
from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.encoder import cnn_encoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    cfg = get_config(args.model)
    H, W = args.height, args.width
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, H, W, 3)) * 0.1, jnp.bfloat16)

    a = (params["cnn_backbone"], img)
    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), a)
    comp = jax.jit(cnn_encoder).lower(*spec).compile()
    rows = parse_entry(comp.as_text())
    tot_phys = sum(r[2] for r in rows)
    tot_log = sum(r[3] for r in rows)
    print(f"encoder entry traffic: {tot_phys/1e9:.2f} GB physical vs "
          f"{tot_log/1e9:.2f} GB logical ({tot_phys/max(tot_log,1):.2f}x)")
    by_op = collections.Counter()
    for _, op, p, l, *_ in rows:
        by_op[op] += p
    print("\nby op kind (physical GB):")
    for op, p in by_op.most_common(12):
        print(f"  {op:24s} {p/1e9:8.2f}")
    print(f"\ntop {args.top} instructions by physical bytes (out+reads):")
    for name, op, p, l, op_, ol, _src in sorted(rows, key=lambda r: -r[2])[:args.top]:
        print(f"  {op:20s} {p/1e6:9.1f} MB phys ({l/1e6:9.1f} log)  {name[:70]}")


if __name__ == "__main__":
    main()
