"""Fetch released reference checkpoints and convert them for this engine.

The reference publishes its trained weights on HuggingFace
(reference: README.md:155-169, files CH{ch}NTR{n}.pth); this environment has
no network, so the BASELINE accuracy row (<=0.1 px EPE vs reference
checkpoints on Middlebury/ETH3D/Booster) cannot be measured here — but the
day network exists this one command chain fills it with zero new code:

  python -m s2m2_tpu.tools.fetch_weights --model S --out weights/
  python -m s2m2_tpu.tools.eval_dataset --root <middlebury-root> \
      --model S --checkpoint weights/CH128NTR1.npz

The download step is mock-tested (tests/test_fetch_weights.py) by pointing
--url-base at a local file:// tree; the conversion step is the same
convert_checkpoint code already pinned by the golden fixtures and the
CH128NTR1 state-dict key-set identity test (tests/test_checkpoint.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request

from ..config import VARIANTS

HF_BASE = "https://huggingface.co/minimok/s2m2/resolve/main"


def checkpoint_filename(model_type: str) -> str:
    v = VARIANTS[model_type]
    return f"CH{v['feature_channels']}NTR{v['num_transformer']}.pth"


def fetch(model_type: str, out_dir: str, url_base: str = HF_BASE,
          convert: bool = True, progress=print) -> str:
    """Download (if missing) and convert one variant's checkpoint.
    Returns the path of the converted .npz."""
    os.makedirs(out_dir, exist_ok=True)
    fname = checkpoint_filename(model_type)
    pth_path = os.path.join(out_dir, fname)
    if not os.path.exists(pth_path):
        url = f"{url_base}/{fname}"
        progress(f"downloading {url} -> {pth_path}")
        tmp = pth_path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, pth_path)
    else:
        progress(f"found existing {pth_path}")
    if not convert:
        return pth_path
    npz_path = pth_path[:-4] + ".npz"
    if not os.path.exists(npz_path):
        from .convert_checkpoint import convert_pth
        progress(f"converting {pth_path} -> {npz_path}")
        convert_pth(pth_path, npz_path)
    else:
        progress(f"found existing {npz_path}")
    return npz_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="all",
                    choices=["all"] + sorted(VARIANTS))
    ap.add_argument("--out", default="weights")
    ap.add_argument("--url-base", default=HF_BASE,
                    help="override for mirrors / local file:// trees")
    ap.add_argument("--no-convert", action="store_true",
                    help="download only, skip .pth -> .npz conversion")
    args = ap.parse_args(argv)
    models = sorted(VARIANTS) if args.model == "all" else [args.model]
    for m in models:
        path = fetch(m, args.out, url_base=args.url_base,
                     convert=not args.no_convert)
        print(f"{m}: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
