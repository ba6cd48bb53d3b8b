"""Convert reference PyTorch checkpoints (CH{c}NTR{n}.pth) to s2m2_tpu params.

Layout mapping (reference state-dict -> our pytree, see models/init.py):
  Conv2d weight           (O, I, kh, kw) -> (kh, kw, I, O)
  ConvTranspose2d weight  (I, O, kh, kw) -> (kh, kw, I, O)
  Linear weight           (O, I)         -> (I, O)
  norm weight/bias        (C,)           -> unchanged

The reference stores {'state_dict': ...} pickles (reference:
core/utils/model_utils.py:39-40); dotted names map 1:1 onto our nested dict.
Shape-mismatched tensors are skipped with a warning, mirroring the reference's
tolerant loader (reference: s2m2.py:69-78).

Output format: a .npz with flat dotted keys (loadable without torch), plus
`load_npz` to re-nest at load time.
"""
from __future__ import annotations

import sys

import numpy as np

# torch ConvTranspose2d module paths inside S2M2 (weight layout (I,O,kh,kw))
_TRANSPOSED_CONV_KEYS = (
    "upsample_mask_1x.conv_disp.0",
    "upsample_mask_1x.conv_rgb.0",
    "upsample_mask_1x.conv_ctx",
    "upsample_mask_1x.conv_concat.2",
    "upsample_mask_4x_refine.conv_x",
    "upsample_mask_4x_refine.conv_concat.2",
)


def convert_tensor(name: str, arr: np.ndarray) -> np.ndarray:
    """Apply the torch->jax layout transform for one state-dict entry."""
    if not name.endswith(".weight"):
        return arr
    mod = name[: -len(".weight")]
    if arr.ndim == 4:
        if any(mod == k or mod.endswith("." + k) for k in _TRANSPOSED_CONV_KEYS):
            # (I, O, kh, kw) -> (kh, kw, I, O)
            return np.transpose(arr, (2, 3, 0, 1))
        # (O, I, kh, kw) -> (kh, kw, I, O)
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def convert_state_dict(state_dict) -> dict:
    """torch state_dict (name -> tensor/ndarray) -> flat {dotted: np.ndarray}."""
    out = {}
    for name, t in state_dict.items():
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        out[name] = convert_tensor(name, arr.astype(np.float32))
    return out


def nest(flat: dict) -> dict:
    """{dotted.name: arr} -> nested dict pytree."""
    tree: dict = {}
    for name, arr in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def flatten(tree: dict, prefix="") -> dict:
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, name))
        else:
            flat[name] = v
    return flat


def save_npz(path: str, flat: dict):
    np.savez(path, **flat)


def load_npz(path: str, dtype=None):
    """Load a converted checkpoint into the nested params pytree."""
    import jax.numpy as jnp
    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k], dtype=dtype) for k in z.files}
    return nest(flat)


def convert_pth(pth_path: str, out_path: str):
    import torch  # local import: torch is only needed for conversion
    ckpt = torch.load(pth_path, weights_only=True, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    flat = convert_state_dict(sd)
    save_npz(out_path, flat)
    print(f"converted {len(flat)} tensors -> {out_path}")


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m s2m2_tpu.tools.convert_checkpoint IN.pth OUT.npz")
        return 2
    convert_pth(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
