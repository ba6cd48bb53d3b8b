"""Does Mosaic lower int8 x int8 -> int32 dots onto the MXU inside a Pallas
kernel, and how fast vs bf16? (Feasibility gate for an int8 fused scanline
block — dev tool, run on the TPU.)"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2m2_tpu.runtime.profiling import chained_timer

G, W, C = 8, 304, 384  # a scanline row-group at XL 4x shapes (VMEM-sized)
REPS = 8  # matmuls per kernel invocation (amortize grid/dispatch)


def _kernel_bf16(x_ref, w_ref, o_ref):
    acc = x_ref[...]
    for _ in range(REPS):
        acc = jax.lax.dot_general(
            acc, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    o_ref[...] = acc


def _kernel_int8(x_ref, w_ref, o_ref):
    acc = x_ref[...]
    for _ in range(REPS):
        q = jnp.clip(jnp.round(acc.astype(jnp.float32) * 8.0),
                     -127, 127).astype(jnp.int8)
        a = jax.lax.dot_general(
            q, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = (a.astype(jnp.float32) * (1.0 / 8.0 / 127.0)).astype(jnp.bfloat16)
    o_ref[...] = acc


def run(name, kernel, w):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((G, W, C)) * 0.1,
                    jnp.bfloat16)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, W, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    flops = 2 * G * W * C * C * REPS
    try:
        dt = chained_timer(lambda a, b: f(a, b), x, w, n_iter=10, n_warmup=1)
        eff = flops / max(dt - 2.4e-3, 1e-6) / 1e12  # minus dispatch floor
        print(f"{name:24s} {dt*1e3:8.3f} ms  ~{eff:6.1f} TOP/s (dispatch-corrected)")
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(1)
    w_bf = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 128, (C, C)), jnp.int8)
    run("pallas bf16 dot x8", _kernel_bf16, w_bf)
    run("pallas int8 dot x8", _kernel_int8, w_i8)


if __name__ == "__main__":
    main()
