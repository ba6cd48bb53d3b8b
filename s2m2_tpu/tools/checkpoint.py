"""Training checkpoint/resume via Orbax (new scope — the reference is
inference-only, SURVEY.md §5.4; its .pth loading is covered by
convert_checkpoint.py).

Layout: <dir>/<step>/ holds {params, opt_state, meta}; restore picks the
latest step by default. Works with sharded arrays (orbax restores to the
same sharding the arrays were saved with, or to a target pytree's shardings).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def _manager(directory, max_to_keep=3):
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(directory, step, params, opt_state=None, meta=None,
                    max_to_keep=3):
    """Save a training state; returns the step saved."""
    mgr = _manager(directory, max_to_keep)
    items = {"params": ocp.args.StandardSave(params)}
    if opt_state is not None:
        items["opt_state"] = ocp.args.StandardSave(opt_state)
    if meta is not None:
        items["meta"] = ocp.args.JsonSave(meta)
    mgr.save(step, args=ocp.args.Composite(**items))
    mgr.wait_until_finished()
    mgr.close()
    return step


def latest_step(directory):
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory, step=None, params_target=None,
                       opt_state_target=None, with_meta=False):
    """Restore (params[, opt_state][, meta]) from the given or latest step.

    Targets (abstract pytrees of jax.ShapeDtypeStruct or concrete arrays)
    drive dtype/sharding of the restored arrays when provided.
    """
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {directory}")
    items = {}
    items["params"] = (ocp.args.StandardRestore(params_target)
                       if params_target is not None
                       else ocp.args.StandardRestore())
    if opt_state_target is not None:
        items["opt_state"] = ocp.args.StandardRestore(opt_state_target)
    if with_meta:
        items["meta"] = ocp.args.JsonRestore()
    out = mgr.restore(step, args=ocp.args.Composite(**items))
    mgr.close()
    result = [out["params"]]
    if opt_state_target is not None:
        result.append(out["opt_state"])
    if with_meta:
        result.append(out["meta"])
    return result[0] if len(result) == 1 else tuple(result)
