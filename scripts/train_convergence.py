"""Training convergence validation on synthetic stereo (CPU-runnable).

VERDICT r3 weak #7: "training remains smoke-scale ... no run longer than a
loss-decreases smoke". This runs the full training subsystem — synthetic
data pipeline, stereo-aware augmentation (train/augment.py), RAFT-style
sequence supervision, warmup-cosine schedule, optional bf16 mixed
precision — for hundreds of steps on a small-but-real config, evaluating
EPE / bad-2.0 on HELD-OUT synthetic scenes at intervals. The deliverable
is the recorded history (train_convergence.json): held-out EPE must drop
far below the random-init baseline, demonstrating the pipeline actually
learns, not merely that the loss is differentiable.

Runs on CPU (forced below) so it never contends with the TPU bench.
Usage: python scripts/train_convergence.py [--steps 400] [--bf16]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from s2m2_tpu.config import ModelConfig
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward
from s2m2_tpu.train.augment import augment_batches
from s2m2_tpu.train.data import synthetic_stereo_batches
from s2m2_tpu.train.step import make_optimizer, make_train_step
from s2m2_tpu.utils import metrics


def make_eval_set(cfg, n=4, height=96, width=128, max_disp=16, seed=9999):
    """Held-out scenes from a seed the training stream never uses."""
    return list(synthetic_stereo_batches(batch=1, height=height, width=width,
                                         max_disp=max_disp, seed=seed,
                                         n_batches=n))


_EVAL_FWD = {}


def evaluate(params, cfg, eval_set, dtype=jnp.float32):
    """Held-out EPE / bad-2.0 with the inference forward. The jitted
    forward is cached per-config so periodic evals don't re-trace (a fresh
    jax.jit closure per call would recompile every interval)."""
    fwd = _EVAL_FWD.get(id(cfg))
    if fwd is None:
        fwd = jax.jit(lambda p, a, b: forward(p, a, b, cfg))
        _EVAL_FWD[id(cfg)] = fwd
    epes, bads = [], []
    for s in eval_set:
        disp, occ, conf = fwd(params,
                              jnp.asarray(s["img0"], dtype),
                              jnp.asarray(s["img1"], dtype))
        d = np.asarray(disp, np.float32)[..., 0]
        gt = s["gt_disp"][..., 0]
        valid = s["valid"][..., 0] > 0
        epes.append(metrics.epe(d, gt, valid))
        bads.append(metrics.bad_ratio(d, gt, 2.0, valid))
    return float(np.mean(epes)), float(np.mean(bads))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--ch", type=int, default=32)
    ap.add_argument("--refine-iter", type=int, default=2)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--max-disp", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 mixed-precision training policy")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--out", default="train_convergence.json")
    ap.add_argument("--save-ckpt", default=None,
                    help="save the final trained params as an npz checkpoint "
                         "(tools.convert_checkpoint layout) — used to commit "
                         "a TRAINED-weight drift fixture")
    args = ap.parse_args()

    cfg = ModelConfig(feature_channels=args.ch, num_transformer=1,
                      refine_iter=args.refine_iter)
    params = init_params(cfg, seed=0)
    eval_set = make_eval_set(cfg, height=args.height, width=args.width,
                             max_disp=args.max_disp)

    e0, b0 = evaluate(params, cfg, eval_set)
    print(f"init (random params): held-out EPE {e0:.3f} px  bad-2.0 {b0:.3f}",
          flush=True)

    optimizer = make_optimizer(lr=args.lr, warmup_steps=max(args.steps // 20, 1),
                               total_steps=args.steps)
    train_step, init_opt = make_train_step(
        cfg, optimizer,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    opt_state = init_opt(params)

    batches = synthetic_stereo_batches(batch=args.batch, height=args.height,
                                       width=args.width,
                                       max_disp=args.max_disp, seed=0)
    if not args.no_augment:
        batches = augment_batches(batches, seed=1)

    history = [{"step": 0, "epe": e0, "bad2": b0}]
    t0 = time.perf_counter()
    for step, batch in enumerate(batches, start=1):
        if step > args.steps:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, m = train_step(params, opt_state, batch)
        if step % args.eval_every == 0 or step == args.steps:
            e, b = evaluate(params, cfg, eval_set)
            rec = {"step": step, "loss": float(m["loss"]),
                   "train_epe": float(m["epe"]), "epe": e, "bad2": b,
                   "sec": round(time.perf_counter() - t0, 1)}
            history.append(rec)
            print(f"step {step}: loss={rec['loss']:.3f} "
                  f"train_epe={rec['train_epe']:.3f} "
                  f"held-out EPE={e:.3f} bad2={b:.3f} "
                  f"({rec['sec']:.0f}s)", flush=True)

    if args.save_ckpt:
        from s2m2_tpu.tools.convert_checkpoint import flatten, save_npz
        flat = {k: np.asarray(v, np.float32)
                for k, v in flatten(params).items()}
        save_npz(args.save_ckpt, flat)
        print(f"saved trained checkpoint -> {args.save_ckpt}")

    result = {
        "config": {"ch": args.ch, "ntr": 1, "refine_iter": args.refine_iter,
                   "hw": [args.height, args.width],
                   "max_disp": args.max_disp, "batch": args.batch,
                   "steps": args.steps, "lr": args.lr, "bf16": args.bf16,
                   "augment": not args.no_augment},
        "init_epe": e0, "final_epe": history[-1]["epe"],
        "init_bad2": b0, "final_bad2": history[-1]["bad2"],
        "history": history,
    }
    # nest per-policy runs in one record: {"fp32": {...}, "bf16": {...}}
    key = "bf16" if args.bf16 else "fp32"
    existing = {}
    if _os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
        if "config" in existing:  # legacy flat schema -> nest it
            existing = {("bf16" if existing["config"].get("bf16")
                         else "fp32"): existing}
    existing[key] = result
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"wrote {args.out}: EPE {e0:.2f} -> {history[-1]['epe']:.2f} px "
          f"(bad-2.0 {b0:.2f} -> {history[-1]['bad2']:.2f})")


if __name__ == "__main__":
    main()
