"""Multi-device sharding: band-sharded outputs must match the unsharded path,
and the sharded training step must run (8 virtual CPU devices, conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward
from s2m2_tpu.parallel.mesh import image_sharding, make_mesh, replicated


@pytest.fixture(scope="module")
def small_setup():
    cfg = ModelConfig(feature_channels=32, num_transformer=1, refine_iter=1)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (2, 128, 96, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (2, 128, 96, 3)), jnp.float32)
    return cfg, params, img0, img1


def test_band_sharded_matches_unsharded(small_setup):
    cfg, params, img0, img1 = small_setup
    ref = jax.jit(lambda p, a, b: forward(p, a, b, cfg))(params, img0, img1)

    mesh = make_mesh(n_data=2, n_band=4)
    img_s = image_sharding(mesh)
    rep = replicated(mesh)
    f = jax.jit(lambda p, a, b: forward(p, a, b, cfg),
                in_shardings=(rep, img_s, img_s))
    got = f(jax.device_put(params, rep), jax.device_put(img0, img_s),
            jax.device_put(img1, img_s))

    # not bitwise: GSPMD changes reduction order (measured ~1e-5 max abs)
    for r, g, name in zip(ref, got, ("disp", "occ", "conf")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=5e-5,
                                   err_msg=name)


def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)
