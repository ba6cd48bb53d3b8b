"""Which weights must stay fp32 to kill the output-upsample bf16 drift?

Runs the golden drift fixtures (tests/golden/s2m2_c32_ntr1*.npz) with the
params cast to bf16 EXCEPT selected subtrees kept fp32 (the fp32-island rule
in layers.conv2d then runs those convs in fp32), and reports mean/max
disparity drift vs the fp32 golden output for a ladder of keep-sets.
CPU-only — never touches the TPU.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.s2m2 import forward
from s2m2_tpu.runtime.engine import cast_params
from s2m2_tpu.tools.convert_checkpoint import nest

GOLDEN = _os.path.join(_os.path.dirname(__file__), "..", "tests", "golden")

KEEP_SETS = {
    "none": (),
    "out-convs": ("refiner.disp_update.2", "refiner.conf_occ_update.2",
                  "global_refiner.out_feat.0"),
    "out-convs+mask1x": ("refiner.disp_update.2", "refiner.conf_occ_update.2",
                         "global_refiner.out_feat.0", "upsample_mask_1x"),
    "mask1x-only": ("upsample_mask_1x",),
    "out+mask1x+mask4x": ("refiner.disp_update.2", "refiner.conf_occ_update.2",
                          "global_refiner.out_feat.0", "upsample_mask_1x",
                          "upsample_mask_4x_refine"),
    "full-heads": ("refiner.disp_update", "refiner.conf_occ_update",
                   "global_refiner.out_feat", "upsample_mask_1x",
                   "upsample_mask_4x_refine"),
    "whole-refiners": ("refiner", "global_refiner", "upsample_mask_1x",
                       "upsample_mask_4x_refine"),
}


def run(fixture):
    path = _os.path.join(GOLDEN, fixture)
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    meta = list(data.pop("__meta"))
    ch, ntr, refine_iter = meta[:3]
    img0 = np.transpose(data.pop("__img0"), (0, 2, 3, 1))
    img1 = np.transpose(data.pop("__img1"), (0, 2, 3, 1))
    ref_disp = np.transpose(data.pop("__disp"), (0, 2, 3, 1))
    for k in ("__occ", "__conf"):
        data.pop(k)
    cfg = ModelConfig(feature_channels=int(ch), num_transformer=int(ntr),
                      refine_iter=int(refine_iter),
                      use_positivity=bool(meta[3]) if len(meta) > 3 else True,
                      output_upsample=bool(meta[4]) if len(meta) > 4 else False)
    params32 = nest({k: jnp.asarray(v) for k, v in data.items()})
    print(f"== {fixture} (positivity={cfg.use_positivity}, "
          f"output_upsample={cfg.output_upsample})")
    for name, keep in KEEP_SETS.items():
        p = cast_params(params32, jnp.bfloat16, keep)
        disp, _, _ = forward(p, jnp.asarray(img0, jnp.bfloat16),
                             jnp.asarray(img1, jnp.bfloat16), cfg)
        d = np.abs(np.asarray(disp, np.float32) - ref_disp)
        print(f"  {name:22s} mean {d.mean():.4f} px   max {d.max():.4f} px",
              flush=True)


if __name__ == "__main__":
    for fx in ("s2m2_c32_ntr1_neg_up.npz", "s2m2_c32_ntr1.npz"):
        run(fx)
