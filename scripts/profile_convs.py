"""Micro-benchmark conv shapes used by S2M2-XL @ 1216x1024 vs MXU roofline
(dev tool, real TPU)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

PEAK_TF = 197.0  # v5e bf16
PEAK_BW = 819.0  # GB/s


def timed(fn, *args, n=10):
    def step(s, *a):
        first, rest = a[0], a[1:]
        out = fn(first + (s * 1e-12).astype(first.dtype), *rest)
        return s + out.astype(jnp.float32).mean()

    f = jax.jit(step)
    s = jnp.float32(0)
    for _ in range(2):
        s = f(s, *args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s, *args)
    float(s)
    return (time.perf_counter() - t0) / n


def conv(x, w, stride=1, lhs_dil=1):
    kh, kw = w.shape[0], w.shape[1]
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        lhs_dilation=(lhs_dil, lhs_dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench(name, b, h, w, cin, cout, k, stride=1, lhs_dil=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)
    dt = timed(lambda x, w: conv(x, w, stride, lhs_dil), x, wt)
    # true output extent of an lhs-dilated conv with k//2 padding
    ho = ((h - 1) * lhs_dil + 1 + 2 * (k // 2) - k) // stride + 1
    wo = ((w - 1) * lhs_dil + 1 + 2 * (k // 2) - k) // stride + 1
    # for lhs-dilated (transposed) convs only k*k/lhs_dil^2 taps per output
    # pixel hit real (non-inserted-zero) inputs — don't overcount FLOPs
    fl = 2 * b * ho * wo * k * k * cin * cout // (lhs_dil * lhs_dil)
    gb = (x.size + wt.size + b * ho * wo * cout) * 2 / 1e9
    print(f"{name:34s} {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/1e12/PEAK_TF*100:4.1f}% MXU)  bw {gb/dt:6.0f} GB/s")


def bench_matmul(name, m, kk, n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, kk)), jnp.bfloat16)
    bm = jnp.asarray(rng.normal(size=(kk, n)), jnp.bfloat16)
    dt = timed(lambda a, b: a @ b, a, bm)
    fl = 2 * m * kk * n
    print(f"{name:34s} {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/1e12/PEAK_TF*100:4.1f}% MXU)")


def main():
    print("== reference GEMM ==")
    bench_matmul("matmul 155648x384x384", 2 * 256 * 304, 384, 384)
    bench_matmul("matmul 8192x8192x8192", 8192, 8192, 8192)
    print("== conv shapes in the model ==")
    # encoder
    bench("enc 1x1 3->16 @full (2x)", 2, 1024, 1216, 3, 16, 1)
    bench("enc 5x5 s2 16->384 @full (2x)", 2, 1024, 1216, 16, 384, 5, stride=2)
    bench("enc 3x3 384->384 @1/2 (2x)", 2, 512, 608, 384, 384, 3)
    bench("enc 3x3 s2 384->384 @1/2 (2x)", 2, 512, 608, 384, 384, 3, stride=2)
    # unet/refiner conv blocks at 1/4
    bench("3x3 384->384 @1/4 (2x)", 2, 256, 304, 384, 384, 3)
    bench("3x3 384->384 @1/4 (1x)", 1, 256, 304, 384, 384, 3)
    bench("1x1 384->384 @1/4 (2x)", 2, 256, 304, 384, 384, 1)
    bench("3x3 768->768 @1/16", 2, 64, 76, 768, 768, 3)
    # GRU separable convs (k=5 separable as 5x1/1x5 is approximated by 5x5 here? use real: 1x5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 256, 304, 576)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(1, 5, 576, 192)), jnp.bfloat16)
    dt = timed(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x, wt)
    fl = 2 * 256 * 304 * 5 * 576 * 192
    print(f"{'gru 1x5 576->192 @1/4':34s} {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s ({fl/dt/1e12/PEAK_TF*100:4.1f}% MXU)")
    # upsample-mask transposed convs (as lhs_dilated convs)
    bench("convT(s2) 384->48 @1/4->1/2", 1, 256, 304, 384, 48, 4, lhs_dil=2)
    bench("convT(s2) 64->9 @1/2->full", 1, 512, 608, 64, 9, 4, lhs_dil=2)
    bench("convT 1->16 @full 3x3", 1, 1024, 1216, 1, 16, 3)
    bench("conv 3x3 35->32 @full", 1, 1024, 1216, 35, 32, 3)


if __name__ == "__main__":
    main()
