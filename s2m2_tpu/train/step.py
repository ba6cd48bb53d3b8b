"""Training step: optax optimizer + sharded jit train step.

With parameters replicated and the batch sharded over ('data', 'band'),
jit/GSPMD derives the gradient all-reduce automatically — no hand-written
collectives (the scaling-book recipe: annotate shardings, let XLA insert
psums).
"""
from __future__ import annotations

import jax
import optax

from ..config import ModelConfig
from ..models.s2m2 import forward
from .loss import sequence_loss


def make_optimizer(lr=2e-4, weight_decay=1e-5, clip=1.0, warmup_steps=0,
                   total_steps=None):
    """AdamW + global-norm clip, optionally under a linear-warmup +
    cosine-decay schedule (warmup_steps > 0 requires total_steps) — the
    standard recipe for transformer stereo training; constant lr when
    warmup_steps == 0 (tiny smoke runs)."""
    if warmup_steps > 0:
        if total_steps is None:
            raise ValueError("warmup schedule needs total_steps")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=total_steps, end_value=lr * 0.01)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_step(cfg: ModelConfig, optimizer, mesh=None,
                    image_sharding=None, replicated=None,
                    compute_dtype=None):
    """Returns (train_step, init_opt_state).

    train_step(params, opt_state, batch) -> (params, opt_state, metrics)
    batch = dict(img0, img1, gt_disp, valid) with (B, H, W, C) leaves.

    compute_dtype=jnp.bfloat16 enables the mixed-precision policy: fp32
    MASTER params (the optimizer state and updates stay fp32), with the
    forward traced on a bf16 cast of params+images — the cast is inside the
    differentiated function, so gradients flow back through it and land
    fp32 on the masters (the standard bf16-training recipe; loss and
    metrics stay fp32 via the model's fp32 islands and the fp32 state
    carry). Default None = fp32 throughout (tiny smoke runs/tests).
    """
    import jax.numpy as jnp

    def loss_fn(params, batch):
        img0, img1 = batch["img0"], batch["img1"]
        if compute_dtype is not None:
            params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
            img0 = img0.astype(compute_dtype)
            img1 = img1.astype(compute_dtype)
        disp, occ, conf, aux = forward(params, img0, img1,
                                       cfg, return_aux=True)
        disp, occ, conf = (x.astype(jnp.float32) for x in (disp, occ, conf))
        total, metrics = sequence_loss(aux["disp_seq"], disp, occ, conf,
                                       batch["gt_disp"], batch["valid"],
                                       batch.get("gt_nonocc"))
        return total, metrics

    def train_step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is not None:
        rep = replicated
        train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep,
                          dict(img0=image_sharding, img1=image_sharding,
                               gt_disp=image_sharding, valid=image_sharding)),
            out_shardings=(rep, rep, rep))
    else:
        train_step = jax.jit(train_step)

    return train_step, optimizer.init
