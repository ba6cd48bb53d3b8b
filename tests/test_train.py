"""Training subsystem: synthetic data, loss decreases, checkpoints written."""
import numpy as np

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.train.data import synthetic_stereo_batches
from s2m2_tpu.train.trainer import train


def test_synthetic_data_consistency():
    gen = synthetic_stereo_batches(batch=1, height=64, width=96, max_disp=12,
                                   n_batches=1, seed=1)
    b = next(iter(gen))
    assert b["img0"].shape == (1, 64, 96, 3)
    assert b["gt_disp"].min() >= 2 and b["gt_disp"].max() <= 12
    # right view really is the left content shifted by gt disparity:
    # left[y, x] == right[y, x - d] for constant-d regions (check medians)
    img0, img1, d = b["img0"][0], b["img1"][0], b["gt_disp"][0, ..., 0]
    y, x = 32, 48
    dd = int(d[y, x])
    if (d[y - 2:y + 3, x - dd - 2:x + 3] == dd).all():
        np.testing.assert_allclose(img0[y, x], img1[y, x - dd], atol=1e-3)


def test_train_loss_decreases(tmp_path):
    cfg = ModelConfig(feature_channels=16, num_transformer=1, refine_iter=1)
    batches = synthetic_stereo_batches(batch=1, height=64, width=96,
                                       max_disp=12, n_batches=8, seed=0)
    params, history = train(cfg, batches, num_steps=8, lr=2e-4,
                            log_every=1, log=lambda *a: None,
                            checkpoint_dir=str(tmp_path / "ckpt"),
                            checkpoint_every=1000)
    assert len(history) == 8
    assert np.isfinite(history[-1]["loss"])
    # loss should drop vs the first step on this tiny overfit workload
    assert history[-1]["loss"] < history[0]["loss"]
    from s2m2_tpu.tools.checkpoint import latest_step
    assert latest_step(str(tmp_path / "ckpt")) == 8


def test_sharded_train_step_ntr2():
    """One sharded train step at NTR=2 (per-repeat MRT params + n_attn=4
    pyramid) over the ('data','band') mesh — the stacked-repeat path the
    base training tests never exercise."""
    import jax
    import optax

    from s2m2_tpu.models.init import init_params
    from s2m2_tpu.parallel.mesh import image_sharding, make_mesh, replicated
    from s2m2_tpu.train.step import make_train_step

    cfg = ModelConfig(feature_channels=16, num_transformer=2, refine_iter=1)
    mesh = make_mesh(n_data=2, n_band=4)
    step, init_opt = make_train_step(cfg, optax.adamw(1e-4), mesh=mesh,
                                     image_sharding=image_sharding(mesh),
                                     replicated=replicated(mesh))
    params = jax.device_put(init_params(cfg, seed=0), replicated(mesh))
    opt_state = init_opt(params)
    batch = next(iter(synthetic_stereo_batches(batch=2, height=64, width=96,
                                               max_disp=12, n_batches=1,
                                               seed=2)))
    import jax.numpy as jnp
    batch = {k: jax.device_put(jnp.asarray(v), image_sharding(mesh))
             for k, v in batch.items()}
    params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
