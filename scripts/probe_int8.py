"""Probe the v5e reduced-precision MXU path (dev tool, run on the TPU).

Measures, via chained_timer (the honest-timing harness):
  1. bf16 x bf16 -> f32 matmul at a peak-probing square shape
  2. int8 x int8 -> s32 matmul, same shape (v5e int8 peak ~2x bf16)
  3. int4 x int4 -> s32 matmul if it lowers
  4. bf16 conv 3x3 C->C at the XL 1/4-res shape
  5. int8 conv 3x3, same shape (does XLA:TPU lower int8 convs natively?)
  6. end-to-end dynamic-quant linear at the MRT projection shape:
     bf16 x -> per-tensor max-abs int8 quant -> int8 dot(int8 w) -> dequant
     vs the plain bf16 dot it would replace

Informs VERDICT round-2 item #1 (int8 MXU path).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from s2m2_tpu.runtime.profiling import chained_timer


def timed(name, fn, *args, n=8, flops=None):
    try:
        dt = chained_timer(fn, *args, n_iter=n, n_warmup=1, perturb_arg=0)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    msg = f"{name:44s} {dt * 1e3:9.3f} ms"
    if flops:
        msg += f"  {flops / dt / 1e12:8.1f} TOP/s"
    print(msg, flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # --- square matmul peak probes ---
    M = K = N = 8192
    fl = 2 * M * K * N
    a_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    b_bf = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)
    timed("matmul 8k^3 bf16->f32", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32), a_bf, b_bf, flops=fl)

    a_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    timed("matmul 8k^3 int8->s32", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.int32), a_i8, b_i8, flops=fl)

    # int8 x int8 -> bf16 result (rounded once from the s32 accumulator)
    timed("matmul 8k^3 int8->f32", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32), a_i8, b_i8, flops=fl)

    try:
        a_i4 = a_i8.astype(jnp.int4)
        b_i4 = b_i8.astype(jnp.int4)
        timed("matmul 8k^3 int4->s32", lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.int32), a_i4, b_i4, flops=fl)
    except Exception as e:
        print("int4 unavailable:", e)

    # --- conv probes at XL 1/4-res shape ---
    B, H4, W4, C = 2, 256, 304, 384
    x_bf = jnp.asarray(rng.standard_normal((B, H4, W4, C)) * 0.1, jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    cfl = 2 * B * H4 * W4 * C * C * 9
    dn = ("NHWC", "HWIO", "NHWC")
    timed("conv3x3 384->384 bf16", lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn), x_bf, w_bf,
        flops=cfl)

    x_i8 = jnp.asarray(rng.integers(-127, 128, (B, H4, W4, C)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)
    timed("conv3x3 384->384 int8->s32",
          lambda x, w: lax.conv_general_dilated(
              x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
              preferred_element_type=jnp.int32), x_i8, w_i8, flops=cfl)

    # --- end-to-end dynamic-quant linear at MRT projection shape ---
    Mt, Ct = 2 * 256 * 304, 384
    lfl = 2 * Mt * Ct * Ct
    x_tok = jnp.asarray(rng.standard_normal((Mt, Ct)) * 0.1, jnp.bfloat16)
    w_tok = jnp.asarray(rng.standard_normal((Ct, Ct)) * 0.05, jnp.bfloat16)
    timed("linear 156k.384.384 bf16", lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x_tok, w_tok, flops=lfl)

    # pre-quantized weight (per-column scale), dynamic per-tensor act scale
    w_q = jnp.asarray(rng.integers(-127, 128, (Ct, Ct)), jnp.int8)
    w_s = jnp.asarray(rng.uniform(1e-3, 2e-3, (Ct,)), jnp.float32)

    def dyn_quant_linear(x, wq, ws):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        xs = amax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                      ).astype(jnp.int8)
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)

    timed("linear 156k dyn-int8 (quant+dot+dequant)",
          dyn_quant_linear, x_tok, w_q, w_s, flops=lfl)

    # per-row (per-token-block) act scales — finer grain, still fused
    def dyn_quant_linear_rowwise(x, wq, ws):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        xs = amax / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    timed("linear 156k dyn-int8 row-scales",
          dyn_quant_linear_rowwise, x_tok, w_q, w_s, flops=lfl)

    # int8 conv with dequant epilogue (the production form)
    def dyn_quant_conv(x, wq, ws):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf))
        xs = amax / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)

    w_cs = jnp.asarray(rng.uniform(1e-3, 2e-3, (C,)), jnp.float32)
    timed("conv3x3 dyn-int8 (quant+conv+dequant)",
          dyn_quant_conv, x_bf, w_i8, w_cs, flops=cfl)


if __name__ == "__main__":
    main()
