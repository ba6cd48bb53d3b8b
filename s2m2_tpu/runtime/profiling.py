"""Profiling/tracing utilities (SURVEY.md §5.1 — the reference only has
CUDA-event wall timing; this is the TPU-native equivalent and more).

`chained_timer` is the load-bearing piece: on the tunneled axon runtime,
repeated identical executions are elided/cached and `block_until_ready` is
unreliable, so honest timing requires (a) a scalar carried through every
iteration that the next iteration's *inputs* depend on, and (b) a host fetch
to synchronize. See also StereoEngine.benchmark.

`trace` wraps jax.profiler for platforms where device tracing works.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def make_chained_step(fn, perturb_arg=0):
    """Build the canonical honest-timing step for `fn`: the perturb_arg-th
    input is nudged by a non-foldable epsilon of the carried scalar and the
    first output leaf folds back into it. Returns step(s, *args) ->
    (s_new, out) — jit it ONCE and reuse it for both timing and results
    (jitting a second results-only program would double the ~12 min remote
    compile on axon, VERDICT r2 weak #8)."""

    def step(s, *a):
        eps = s * 1e-12
        perturbed = jax.tree.map(lambda x: x + eps.astype(x.dtype),
                                 a[perturb_arg])
        a = a[:perturb_arg] + (perturbed,) + a[perturb_arg + 1:]
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return s + leaf.astype(jnp.float32).mean(), out

    return step


def run_chained(jitted_step, *args, n_iter=10, n_warmup=1):
    """Drive a jitted make_chained_step program; returns (sec/call, last_out).

    Each iteration's inputs depend on the previous output via the carried
    scalar (the runtime elides repeated identical executions) and the only
    reliable sync on the tunneled runtime is a host fetch of the scalar."""
    n_warmup = max(1, n_warmup)  # 0 would time the first-execution compile
    s = jnp.float32(0)
    out = None
    for _ in range(n_warmup):
        s, out = jitted_step(s, *args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        s, out = jitted_step(s, *args)
    float(s)  # host fetch = the only reliable sync on axon
    return (time.perf_counter() - t0) / n_iter, out


def chained_timer(fn, *args, n_iter=10, n_warmup=1, perturb_arg=0):
    """Time `fn(*args)` honestly; returns seconds per call.

    All array inputs — model parameters included — must be passed via *args,
    NOT closed over in `fn`: closure arrays become embedded constants in the
    serialized computation, which the axon remote-compile endpoint rejects
    above ~hundreds of MB (HTTP 413) and which lets XLA constant-fold
    weights into unrepresentative code. Use `perturb_arg` to point at a
    cheap-to-perturb input (e.g. the image, not the 406M-param tree).
    """
    f = jax.jit(make_chained_step(fn, perturb_arg))
    dt, _ = run_chained(f, *args, n_iter=n_iter, n_warmup=n_warmup)
    return dt


@contextlib.contextmanager
def trace(logdir="/tmp/s2m2_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # tracing may be unsupported on tunneled backends
        print(f"profiler trace unavailable: {e}")
        started = False
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def flops_report(fn, *args):
    """XLA cost analysis of the compiled fn: (tflops, gbytes) per call."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"tflops": ca.get("flops", 0) / 1e12,
            "gbytes": ca.get("bytes accessed", 0) / 1e9}
