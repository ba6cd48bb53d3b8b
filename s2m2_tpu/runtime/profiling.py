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


def chained_timer(fn, *args, n_iter=10, n_warmup=1, perturb_arg=0):
    """Time `fn(*args)` honestly. args[perturb_arg] (a pytree of arrays) is
    perturbed with a non-foldable negligible term derived from the carried
    scalar, and the first output leaf folds back into the scalar.

    All array inputs — model parameters included — must be passed via *args,
    NOT closed over in `fn`: closure arrays become embedded constants in the
    serialized computation, which the axon remote-compile endpoint rejects
    above ~hundreds of MB (HTTP 413) and which lets XLA constant-fold
    weights into unrepresentative code. Use `perturb_arg` to point at a
    cheap-to-perturb input (e.g. the image, not the 406M-param tree).

    Returns seconds per call.
    """
    # n_warmup=0 would put the first-execution compile (~12 min remote on
    # axon) inside the timed loop — never meaningful; clamp.
    n_warmup = max(1, n_warmup)

    def step(s, *a):
        eps = s * 1e-12
        perturbed = jax.tree.map(lambda x: x + eps.astype(x.dtype),
                                 a[perturb_arg])
        a = a[:perturb_arg] + (perturbed,) + a[perturb_arg + 1:]
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return s + leaf.astype(jnp.float32).mean()

    f = jax.jit(step)
    s = jnp.float32(0)
    for _ in range(n_warmup):
        s = f(s, *args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        s = f(s, *args)
    float(s)  # host fetch = the only reliable sync on axon
    return (time.perf_counter() - t0) / n_iter


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
