"""Precision-drift bounds under TRAINED weights (round-4 verdict weak #3).

Every other drift bound in the suite rides random ±1/√fan init weights,
whose activation statistics are unrealistically well-behaved. This file
re-asserts the bf16 / int8 / int8r drift bounds and the calibration
robustness claims (low-res calibration, percentile calibration) on the
COMMITTED trained checkpoint `tests/golden/trained_c32.npz` — the 600-step
converged model from scripts/train_convergence.py (held-out EPE
2.37 → 0.80 px, train_convergence.json), evaluated on a held-out synthetic
scene the training stream never saw.

Reference budget: 0.1 px (BASELINE.md drift budget).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models import quant
from s2m2_tpu.models.s2m2 import forward
from s2m2_tpu.runtime.engine import cast_params, fp32_keep_paths
from s2m2_tpu.tools.convert_checkpoint import nest
from s2m2_tpu.train.data import synthetic_stereo_batches

CFG = ModelConfig(feature_channels=32, num_transformer=1, refine_iter=2)
CKPT = os.path.join(os.path.dirname(__file__), "golden", "trained_c32.npz")


@pytest.fixture(scope="module")
def trained():
    """(fp32 params, held-out scene, fp32 reference disp)."""
    with np.load(CKPT) as z:
        params = nest({k: jnp.asarray(z[k]) for k in z.files})
    scene = next(synthetic_stereo_batches(batch=1, height=96, width=128,
                                          max_disp=16, seed=9999))
    a = jnp.asarray(scene["img0"], jnp.float32)
    b = jnp.asarray(scene["img1"], jnp.float32)
    ref = np.asarray(
        jax.jit(lambda p, x, y: forward(p, x, y, CFG))(params, a, b)[0],
        np.float32)
    return params, scene, a, b, ref


def test_trained_model_actually_learned(trained):
    """The committed checkpoint is a genuinely trained model: held-out EPE
    far below the random-init baseline (2.37 px at init)."""
    _, scene, _, _, ref = trained
    gt = scene["gt_disp"]
    valid = scene["valid"] > 0
    epe = float(np.abs(ref - gt)[valid].mean())
    assert epe < 1.3, f"trained fixture held-out EPE {epe}"


def _bf16_params(params):
    return cast_params(params, jnp.bfloat16, fp32_keep_paths(CFG))


def test_trained_bf16_drift(trained):
    params, _, a, b, ref = trained
    pb = _bf16_params(params)
    disp = np.asarray(forward(pb, a.astype(jnp.bfloat16),
                              b.astype(jnp.bfloat16), CFG)[0], np.float32)
    epe = float(np.abs(disp - ref).mean())
    # measured 0.026 px — ~2x the random-weight fixtures' bf16 drift
    # (0.003-0.013): trained statistics DO drift more, exactly the
    # round-4 concern; still 4x inside the 0.1 px budget
    assert epe < 0.04, f"trained bf16 drift {epe}"


@pytest.mark.parametrize("residency,bound", [(False, 0.03), (True, 0.04)])
def test_trained_int8_drift(trained, residency, bound):
    params, _, a, b, ref = trained
    pb = _bf16_params(params)
    ab, bb = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    with quant.observe(skip_fp32=True, residency=residency) as obs:
        forward(pb, ab, bb, CFG)
    scales = tuple(float(o) / 127.0 for o in obs)
    with quant.quantized(scales, skip_fp32=True, residency=residency):
        disp8 = forward(pb, ab, bb, CFG)[0]
    epe = float(np.abs(np.asarray(disp8, np.float32) - ref).mean())
    assert epe < bound, f"trained int8{'r' if residency else ''} drift {epe}"


def test_trained_low_res_calibration(trained):
    """Resolution-independent calibration must hold under trained
    activation statistics, not just random-weight ones."""
    params, _, a, b, ref = trained
    pb = _bf16_params(params)
    from s2m2_tpu.utils.image import image_pad
    a_lo = jnp.asarray(image_pad(np.asarray(a, np.float32)[:, ::2, ::2]),
                       jnp.bfloat16)
    b_lo = jnp.asarray(image_pad(np.asarray(b, np.float32)[:, ::2, ::2]),
                       jnp.bfloat16)
    with quant.observe(skip_fp32=True) as obs:
        forward(pb, a_lo, b_lo, CFG)
    scales = tuple(float(o) / 127.0 for o in obs)
    with quant.quantized(scales, skip_fp32=True):
        disp8 = forward(pb, a.astype(jnp.bfloat16),
                        b.astype(jnp.bfloat16), CFG)[0]
    epe = float(np.abs(np.asarray(disp8, np.float32) - ref).mean())
    # measured 0.055 px — ~2x the full-res-calibrated trained drift (0.03
    # bound above) and ~3x the random-weight low-res claim (0.02):
    # resolution-independence of calibration DEGRADES under trained
    # statistics (the round-4 concern, now quantified). Caveat: this
    # decimates an already-tiny 96x128 scene to 48x64(+pad), far harsher
    # than production's 1024->512; still inside the 0.1 px budget.
    assert epe < 0.08, f"trained low-res-calibrated int8 drift {epe}"


def test_trained_percentile_calibration(trained):
    """percentile=99.9 calibration stays inside the drift budget on trained
    statistics (outlier-heavy activations are exactly where percentile and
    amax calibration can diverge)."""
    params, _, a, b, ref = trained
    pb = _bf16_params(params)
    ab, bb = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    with quant.observe(skip_fp32=True, percentile=99.9) as obs:
        forward(pb, ab, bb, CFG)
    scales = tuple(float(o) / 127.0 for o in obs)
    with quant.quantized(scales, skip_fp32=True):
        disp8 = forward(pb, ab, bb, CFG)[0]
    epe = float(np.abs(np.asarray(disp8, np.float32) - ref).mean())
    assert epe < 0.05, f"trained percentile-calibrated int8 drift {epe}"
