"""Cost-volume lookup parity vs the reference's grid_sample formulation."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from s2m2_tpu.models.cost_volume import make_cost_volume, cost_volume_lookup


def _torch_lookup(cv, disp, radius=4):
    """Oracle: the reference CostVolume via F.grid_sample
    (reference: submodules.py:19-60), NCHW in/out."""
    def bilinear_sampler(img, coords):
        W = img.shape[-1]
        H = img.shape[-2]
        xgrid, ygrid = coords.split([1, 1], dim=-1)
        xgrid = 2 * xgrid / (W - 1) - 1
        ygrid = 2 * ygrid / (H - 1) - 1
        grid = torch.cat([xgrid, ygrid], dim=-1)
        return F.grid_sample(img, grid, mode="bilinear", align_corners=True)

    b, h, w, w2 = cv.shape
    r = radius
    dx = torch.linspace(-r, r, 2 * r + 1).reshape(1, 1, 2 * r + 1, 1)
    cv_flat = cv.reshape(b * h * w, 1, 1, w2)
    cv_2x = F.avg_pool2d(cv_flat, kernel_size=[1, 2])
    cv_flat = cv_flat.reshape(b * h, 1, w, w2)
    cv_2x = cv_2x.reshape(b * h, 1, w, w2 // 2)
    coords = torch.arange(w, dtype=torch.float32).reshape(1, 1, w, 1)
    coords = coords.repeat(b, h, 1, 1).reshape(b * h * w, 1, 1, 1)

    outs = []
    for vol, scale in ((cv_flat, 1.0), (cv_2x, 2.0)):
        x0 = coords / scale - disp.reshape(b * h * w, 1, 1, 1) / scale + dx
        x0 = x0.reshape(b * h, w, -1, 1)
        y0 = (coords + 0 * dx).reshape(b * h, w, -1, 1)
        corr = bilinear_sampler(vol, torch.cat([x0, y0], dim=-1))
        outs.append(corr.reshape(b, h, w, 2 * r + 1).permute(0, 3, 1, 2))
    return outs


def test_lookup_parity(rng):
    b, h, w = 2, 5, 32
    cv = rng.standard_normal((b, h, w, w)).astype(np.float32)
    disp = (rng.uniform(-3, 10, (b, h, w, 1))).astype(np.float32)

    ref1, ref2 = _torch_lookup(torch.from_numpy(cv),
                               torch.from_numpy(np.transpose(disp, (0, 3, 1, 2))))
    state = make_cost_volume(jnp.asarray(cv), radius=4)
    got1, got2 = cost_volume_lookup(state, jnp.asarray(disp))

    np.testing.assert_allclose(np.asarray(got1),
                               ref1.permute(0, 2, 3, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got2),
                               ref2.permute(0, 2, 3, 1).numpy(), atol=2e-5)


def test_lookup_zero_outside(rng):
    """Far out-of-range disparities must sample zeros (grid_sample zeros pad)."""
    b, h, w = 1, 2, 16
    cv = np.ones((b, h, w, w), np.float32)
    disp = np.full((b, h, w, 1), 1000.0, np.float32)
    state = make_cost_volume(jnp.asarray(cv), radius=4)
    got1, got2 = cost_volume_lookup(state, jnp.asarray(disp))
    assert np.abs(np.asarray(got1)).max() == 0
    assert np.abs(np.asarray(got2)).max() == 0
