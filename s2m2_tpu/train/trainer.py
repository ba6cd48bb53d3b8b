"""Training loop driver: data -> sharded train step -> metrics/checkpoints.

Composes train.data, train.step and tools.checkpoint into the training
subsystem the reference lacks (reference README.md:38). Designed for the
('data','band') mesh; single-device runs just pass mesh=None.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.init import init_params
from .step import make_optimizer, make_train_step


def train(cfg: ModelConfig, batches, *, num_steps=100, lr=1e-4, seed=0,
          mesh=None, checkpoint_dir=None, checkpoint_every=500,
          log_every=10, params=None, log=print, warmup_steps=0,
          compute_dtype=None):
    """Run `num_steps` optimizer steps over `batches` (an iterator of dicts).

    warmup_steps > 0 enables the linear-warmup + cosine-decay LR schedule
    over num_steps. Supervision is RAFT-style sequence loss over the
    per-refine-iteration outputs (train/loss.py::sequence_loss).
    compute_dtype=jnp.bfloat16 enables the mixed-precision policy (fp32
    master params, bf16 forward — see step.make_train_step).
    Returns (params, history list of metric dicts).
    """
    if params is None:
        params = init_params(cfg, seed=seed)
    optimizer = make_optimizer(lr=lr, warmup_steps=warmup_steps,
                               total_steps=num_steps)

    img_s = rep = None
    if mesh is not None:
        from ..parallel.mesh import image_sharding, replicated
        img_s, rep = image_sharding(mesh), replicated(mesh)
        params = jax.device_put(params, rep)
    train_step, init_opt = make_train_step(cfg, optimizer, mesh=mesh,
                                           image_sharding=img_s,
                                           replicated=rep,
                                           compute_dtype=compute_dtype)
    opt_state = init_opt(params)
    if mesh is not None:
        opt_state = jax.device_put(opt_state, rep)

    history = []
    t0 = time.perf_counter()
    for step, batch in enumerate(batches):
        if step >= num_steps:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = {k: jax.device_put(v, img_s) for k, v in batch.items()}
        params, opt_state, metrics = train_step(params, opt_state, batch)
        if step % log_every == 0 or step == num_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m["step"] = step
            m["sec"] = time.perf_counter() - t0
            history.append(m)
            log(f"step {step}: loss={m['loss']:.4f} epe={m['epe']:.3f}")
        if checkpoint_dir and step and step % checkpoint_every == 0:
            from ..tools.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_dir, step, params, opt_state,
                            meta={"step": step})
    if checkpoint_dir:
        from ..tools.checkpoint import save_checkpoint
        save_checkpoint(checkpoint_dir, num_steps, params, opt_state,
                        meta={"step": num_steps})
    return params, history
