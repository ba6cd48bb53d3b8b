"""Generate golden parity fixtures from the reference implementation.

Runs the reference torch model (read-only, used strictly as a black-box
oracle) with random weights on a fixed random stereo pair, converts the state
dict with tools/convert_checkpoint.py, and stores inputs + converted weights +
reference outputs in tests/golden/*.npz. The committed fixture makes the
parity test self-contained (no torch / reference checkout needed at test time).

Usage:  python -m s2m2_tpu.tools.make_golden [reference_root]
"""
from __future__ import annotations

import os
import sys

import numpy as np

from .convert_checkpoint import convert_state_dict

REFERENCE_ROOT = "/root/reference"


def main(reference_root=REFERENCE_ROOT,
         out_path=None,
         feature_channels=32, num_transformer=1, refine_iter=2,
         height=64, width=96, seed=7, use_positivity=True,
         output_upsample=False, tag=""):
    sys.path.insert(0, os.path.join(reference_root, "src"))
    import torch
    torch.manual_seed(seed)
    from s2m2.core.model.s2m2 import S2M2  # reference oracle

    model = S2M2(feature_channels=feature_channels, dim_expansion=1,
                 num_transformer=num_transformer,
                 use_positivity=use_positivity,
                 output_upsample=output_upsample, refine_iter=refine_iter)
    model.eval()

    rng = np.random.default_rng(seed)
    img0 = rng.uniform(0, 255, (1, 3, height, width)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, 3, height, width)).astype(np.float32)

    with torch.no_grad():
        disp, occ, conf = model(torch.from_numpy(img0), torch.from_numpy(img1))

    flat = convert_state_dict(model.state_dict())
    if out_path is None:
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        out_path = os.path.join(
            here, "tests", "golden",
            f"s2m2_c{feature_channels}_ntr{num_transformer}{tag}.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        __img0=img0, __img1=img1,
        __disp=disp.numpy(), __occ=occ.numpy(), __conf=conf.numpy(),
        __meta=np.array([feature_channels, num_transformer, refine_iter,
                         int(use_positivity), int(output_upsample)],
                        np.int64),
        **flat)
    print(f"golden fixture -> {out_path} "
          f"({sum(v.nbytes for v in flat.values()) / 1e6:.1f} MB of weights)")


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
