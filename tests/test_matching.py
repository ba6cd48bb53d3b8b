"""Optimal-transport matcher: parity vs a torch oracle + structural properties."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from s2m2_tpu.models.matching import disp_init, optimal_transport


def _torch_ot(cv_masked, ot_iter=3):
    """Oracle re-statement of the reference OT (submodules.py:169-201)."""
    def lse(x, dim):
        m, _ = x.max(dim=dim, keepdim=True)
        y = (x - m).exp().sum(dim=dim, keepdim=True)
        return (m + torch.log(torch.clamp(y, min=1e-30))).squeeze(dim)

    bs, h, w, _ = cv_masked.shape
    marginal = torch.cat([torch.ones(w), torch.tensor([float(w)])]) / (2 * w)
    log_mu = marginal.log().reshape(1, 1, w + 1)
    log_nu = log_mu
    attn = F.pad(cv_masked, (0, 1, 0, 1))
    v = log_nu - lse(attn, 2)
    u = log_mu - lse(attn + v.unsqueeze(2), 3)
    for _ in range(ot_iter - 1):
        v = log_nu - lse(attn + u.unsqueeze(3), 2)
        u = log_mu - lse(attn + v.unsqueeze(2), 3)
    out = attn + u.unsqueeze(3) + v.unsqueeze(2)
    return (out[:, :, :-1, :-1] + np.log(2 * w)).exp()


def test_ot_parity(rng):
    b, h, w = 2, 3, 24
    cv = rng.standard_normal((b, h, w, w)).astype(np.float32) * 3
    ref = _torch_ot(torch.from_numpy(cv))
    got = optimal_transport(jnp.asarray(cv), ot_iter=3)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4,
                               atol=1e-6)


def test_ot_rows_bounded(rng):
    # after OT the (unmasked) probabilities are a transport plan scaled by 2W:
    # each non-dustbin row should sum to <= ~1 and be non-negative
    b, h, w = 1, 2, 32
    cv = rng.standard_normal((b, h, w, w)).astype(np.float32)
    prob = np.asarray(optimal_transport(jnp.asarray(cv), ot_iter=20))
    assert prob.min() >= 0
    # row marginal (incl. the dropped dustbin column) is 1 after scaling by
    # 2W, so non-dustbin row sums must be in (0, 1]
    row_sums = prob.sum(-1)
    assert row_sums.max() <= 1.02
    assert row_sums.mean() > 0.3


def test_disp_init_synthetic_shift(rng):
    """A feature map shifted right by d pixels should yield disparity ~= d."""
    b, h, w, c = 1, 4, 48, 16
    shift = 5
    base = rng.standard_normal((b, h, w + shift, c)).astype(np.float32) * 2
    # positive disparity d: left pixel x matches right pixel x - d
    f0 = base[:, :, :-shift, :]    # left view: content at x
    f1 = base[:, :, shift:, :]     # right view: same content at x - shift
    feat = jnp.asarray(np.concatenate([f0, f1], axis=0))
    p = {"layer_norm": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}}
    disp, conf, occ, cv = disp_init(p, feat, ot_iter=3, use_positivity=True)
    assert disp.shape == (b, h, w, 1)
    assert cv.shape == (b, h, w, w)
    interior = np.asarray(disp)[:, :, shift + 2:, 0]
    med = np.median(interior)
    assert abs(med - shift) < 0.5, med
    assert np.asarray(conf).min() >= 0
    assert np.asarray(occ).max() <= 1.2


def test_disp_init_positivity_mask():
    """use_positivity must forbid negative disparities (matches j<=i)."""
    rng = np.random.default_rng(42)  # own seed: assertion is data-dependent
    b, h, w, c = 1, 2, 16, 8
    f = rng.standard_normal((2 * b, h, w, c)).astype(np.float32)
    p = {"layer_norm": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}}
    disp, *_ = disp_init(p, jnp.asarray(f), ot_iter=3, use_positivity=True)
    # exact bound: corr <= i*conf, so disp = i - (corr+eps)/(conf+eps) >= -1
    # (the -1 extreme needs conf ~ 0 at column 0)
    assert np.asarray(disp).min() >= -1.0
