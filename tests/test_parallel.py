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


def test_aot_band_sharded_xl_compiles_with_collectives():
    """AOT-compile the band-sharded XL forward at the real benchmark shape
    (1216x1024) on the 8-device virtual mesh: catches sharding-propagation
    regressions that the small-shape numeric test can't (VERDICT round 1).
    Abstract lowering — no 406M-param materialization."""
    import collections
    import re

    from s2m2_tpu.config import get_config

    cfg = get_config("XL")
    mesh = make_mesh(n_data=1, n_band=8)
    img_s = image_sharding(mesh)
    rep = replicated(mesh)
    shapes = jax.eval_shape(lambda: init_params(cfg, seed=0))
    pa = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), shapes)
    a = jax.ShapeDtypeStruct((1, 1024, 1216, 3), jnp.bfloat16)
    f = jax.jit(lambda p, x, y: forward(p, x, y, cfg),
                in_shardings=(rep, img_s, img_s))
    comp = f.lower(pa, a, a).compile()   # ~1 min on CPU

    txt = comp.as_text()
    colls = collections.Counter(
        m.group(1) for m in re.finditer(
            r"(all-gather|all-reduce|collective-permute|reduce-scatter)", txt))
    # conv halo exchanges over 'band' and bottleneck/cross-view all-gathers
    # must be present; their absence means GSPMD degenerated (e.g. full
    # replication or a broken annotation)
    assert colls["collective-permute"] > 100, colls
    assert colls["all-gather"] > 50, colls
    # output shardings must keep H sharded over 'band'
    out_sh = comp.output_shardings[0]
    assert "band" in str(out_sh.spec), out_sh
