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


def main_mrt(reference_root=REFERENCE_ROOT, out_path=None,
             feature_channels=32, num_transformer=1, num_heads=2,
             height=32, width=48, seed=11):
    """Module-level golden fixture for the stacked MRT at num_heads>1.

    The reference S2M2 hard-codes num_heads=1 (reference: s2m2.py:40-44),
    but StackedMRT itself is head-count generic (reference:
    stacked_MRT.py:135-166, internally scaling heads 1/2/4/8x) — this pins
    our multi-head scanline/global attention path against it.
    """
    sys.path.insert(0, os.path.join(reference_root, "src"))
    import torch
    torch.manual_seed(seed)
    from s2m2.core.model.stacked_MRT import StackedMRT  # reference oracle

    c = feature_channels
    model = StackedMRT(num_transformer=num_transformer, dims=[c, c, 2 * c],
                       num_heads=num_heads, dim_expansion=1,
                       use_gate_fusion=True)
    model.eval()

    rng = np.random.default_rng(seed)
    # z0..z3 at relative scales 1/2/4/8 (2B batch = left|right views)
    z = [rng.standard_normal((2, d, height // s, width // s)).astype(np.float32)
         for d, s in ((c, 1), (c, 2), (2 * c, 4), (2 * c, 8))]
    with torch.no_grad():
        out = model(*[torch.from_numpy(zi) for zi in z])

    flat = convert_state_dict(model.state_dict())
    if out_path is None:
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        out_path = os.path.join(
            here, "tests", "golden",
            f"mrt_c{c}_ntr{num_transformer}_h{num_heads}.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        **{f"__z{i}": zi for i, zi in enumerate(z)},
        __out=out.numpy(),
        __meta=np.array([c, num_transformer, num_heads], np.int64),
        **flat)
    print(f"MRT golden fixture -> {out_path}")


def dump_statedict_keys(reference_root=REFERENCE_ROOT, out_path=None,
                        feature_channels=128, num_transformer=1):
    """Dump the live reference state-dict key set + shapes (text fixture).

    Guarantees the checkpoint converter's name/layout mapping covers the
    real released checkpoints (CH128NTR1.pth etc.) exactly — tested by
    tests/test_checkpoint.py::test_statedict_keyset_identity.
    """
    sys.path.insert(0, os.path.join(reference_root, "src"))
    import torch  # noqa: F401
    from s2m2.core.model.s2m2 import S2M2

    model = S2M2(feature_channels=feature_channels, dim_expansion=1,
                 num_transformer=num_transformer)
    if out_path is None:
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        out_path = os.path.join(
            here, "tests", "golden",
            f"statedict_ch{feature_channels}ntr{num_transformer}.txt")
    with open(out_path, "w") as f:
        for k, v in sorted(model.state_dict().items()):
            f.write(f"{k} {','.join(map(str, v.shape))}\n")
    print(f"state-dict key fixture -> {out_path}")


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
