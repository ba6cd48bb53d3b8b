"""Orbax checkpoint save/restore round-trip, including opt_state + meta."""
import numpy as np
import jax
import optax

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.init import init_params
from s2m2_tpu.tools.checkpoint import (latest_step, restore_checkpoint,
                                       save_checkpoint)


def test_roundtrip(tmp_path):
    cfg = ModelConfig(feature_channels=16, num_transformer=1)
    params = init_params(cfg, seed=3)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    save_checkpoint(str(tmp_path), 7, params, opt_state,
                    meta={"cfg": "c16ntr1", "epoch": 1})
    assert latest_step(str(tmp_path)) == 7

    p2, o2, meta = restore_checkpoint(
        str(tmp_path), params_target=params, opt_state_target=opt_state,
        with_meta=True)
    assert meta["cfg"] == "c16ntr1"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    count_a = jax.tree.leaves(opt_state)
    count_b = jax.tree.leaves(o2)
    assert len(count_a) == len(count_b)


def test_max_to_keep(tmp_path):
    cfg = ModelConfig(feature_channels=16, num_transformer=1)
    params = init_params(cfg, seed=0)
    for step in (1, 2, 3, 4):
        save_checkpoint(str(tmp_path), step, params, max_to_keep=2)
    assert latest_step(str(tmp_path)) == 4
    p = restore_checkpoint(str(tmp_path), params_target=params)
    assert len(jax.tree.leaves(p)) == len(jax.tree.leaves(params))
