"""Profiling / timing harness (SURVEY §5: the reference has none; the TPU
framework keeps a FLOPs + wall-clock report).

- ``timed`` — block-until-ready wall-clock timing for jitted callables with
  warmup (compile excluded).
- ``trace`` — context manager around ``jax.profiler`` for TensorBoard traces.
- ``flops_estimate`` — XLA cost analysis of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _sync(out) -> None:
    """Force device completion.

    ``jax.block_until_ready`` alone does not reliably wait on the
    experimental ``axon`` TPU tunnel, so additionally fetch one element of
    each output leaf to the host — the transfer cannot complete before the
    producing computation does.
    """
    jax.block_until_ready(out)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            elt = leaf.ravel()[:1]
            if jnp.issubdtype(elt.dtype, jnp.complexfloating):
                elt = elt.real   # complex D2H is UNIMPLEMENTED on axon
            jax.device_get(elt)


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> dict:
    """-> {"mean_s", "best_s", "iters"} with device completion barriers."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "best_s": min(times),
            "iters": iters}


def loop_cost(body: Callable, *args, n1: int = 4, n2: int = 24,
              iters: int = 3) -> float:
    """True per-evaluation device seconds of ``body(*args)`` — floor-free.

    Loop-in-graph timing at a single loop count N still carries the
    per-program dispatch/sync floor (measured ~54 ms on the axon tunnel)
    divided by N: an empty ``fori_loop`` "costs" 2.7 ms/iter at N=20.
    Differential timing removes it exactly: time the body chained N1 and
    N2 times inside one program each and take the slope
    ``(T(N2) - T(N1)) / (N2 - N1)``.

    ``body(s, *args)`` must return a scalar-convertible value and consume
    ``s`` (the chaining scalar) so XLA cannot hoist iterations.
    """

    def make(n):
        def fn(*args):
            def it(_, s):
                return s + 1e-30 * body(s, *args)
            return jax.lax.fori_loop(0, n, it, jnp.zeros((), jnp.float32))

        return jax.jit(fn)

    f1, f2 = make(n1), make(n2)
    _sync(f1(*args))
    _sync(f2(*args))
    best1 = best2 = float("inf")
    for _ in range(iters):   # interleave to cancel weather drift
        t0 = time.perf_counter()
        _sync(f1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(f2(*args))
        best2 = min(best2, time.perf_counter() - t0)
    return (best2 - best1) / (n2 - n1)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/atsm_trace"):
    """``with trace(): step()`` -> TensorBoard-viewable device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn: Callable, *args) -> float:
    """XLA's FLOPs estimate for one call of ``jit(fn)`` (f64 count)."""
    lowered = jax.jit(fn).lower(*args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0)) if analysis else -1.0


def peak_tflops() -> float:
    """The MFU denominator: the chip's peak dense-matmul TFLOP/s.

    Default 197 (TPU v5e bf16 — the compute dtype of the serving/train
    path); override with ``ATSM_PEAK_TFLOPS`` for other chips/dtypes.
    """
    import os

    return float(os.environ.get("ATSM_PEAK_TFLOPS", "197"))
