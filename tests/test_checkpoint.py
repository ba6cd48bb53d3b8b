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


def test_statedict_keyset_identity_ch128ntr1():
    """Converter coverage vs the live reference S2M2(CH128, NTR1):

    our init_params key set must equal the reference state-dict key set
    exactly (names map 1:1), and every converted shape must match — this
    guarantees tools/convert_checkpoint.py handles the real released
    CH128NTR1.pth mechanically (fixture: tools/make_golden.dump_statedict_keys).
    """
    import os
    import numpy as np
    from s2m2_tpu.tools.convert_checkpoint import convert_tensor, flatten

    fixture = os.path.join(os.path.dirname(__file__), "golden",
                           "statedict_ch128ntr1.txt")
    torch_shapes = {}
    with open(fixture) as f:
        for line in f:
            name, shape = line.split()
            torch_shapes[name] = tuple(int(s) for s in shape.split(","))

    cfg = ModelConfig(feature_channels=128, num_transformer=1)
    ours = {k: tuple(v.shape) for k, v in flatten(init_params(cfg)).items()}

    assert set(ours) == set(torch_shapes), (
        f"missing={sorted(set(torch_shapes) - set(ours))[:5]} "
        f"extra={sorted(set(ours) - set(torch_shapes))[:5]}")
    for name, tshape in torch_shapes.items():
        conv = convert_tensor(name, np.empty(tshape, np.float32)).shape
        assert tuple(conv) == ours[name], (name, tshape, conv, ours[name])
