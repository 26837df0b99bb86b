"""Benchmark timing utilities.

Counterpart of the reference's ``MEASURE`` macro
(sample/benchmark/main.cpp:20-33): N+1 runs, first discarded as warmup,
mean wall-clock msec — plus MP/s, and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def fence(out) -> None:
    """Hard execution fence: forces a (1-element) device→host readback of
    every output leaf.  ``block_until_ready`` alone does not fence on fully
    asynchronous runtimes (e.g. the axon TPU tunnel), which makes naive
    timing loops report dispatch latency instead of kernel time."""
    for leaf in jax.tree_util.tree_leaves(out):
        arr = leaf
        while getattr(arr, "ndim", 0) > 0:
            arr = arr[0]
        np.asarray(arr)


def measure(fn, iters: int = 50) -> float:
    """Mean msec per call over `iters` runs, first (compile) run discarded.
    `fn` must return a jax array (or pytree); each call is readback-fenced,
    so the result includes one host↔device round-trip of latency — use
    measure_chained for pure kernel time."""
    out = fn()
    fence(out)
    total = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        total += time.perf_counter() - t0
    return total / iters * 1e3


def measure_chained(step, init, iters: int = 30, repeats: int = 3) -> float:
    """Pure per-kernel msec via the chain-slope method: time data-dependent
    chains of two lengths (each fenced once) and take the slope — the
    round-trip latency cancels in the difference.  Each length is timed
    ``repeats`` times and the minimum kept: on a remote-tunnel runtime the
    round-trip latency has multi-ms spikes that a single intercept sample
    turns into negative slopes for sub-ms kernels."""
    def chain(n):
        out = init
        for _ in range(n):
            out = step(out)
        fence(out)

    def best_of(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            chain(n)
            best = min(best, time.perf_counter() - t0)
        return best

    chain(2)  # warmup/compile
    n1 = max(2, iters // 8)
    t_short = best_of(n1)
    t_long = best_of(iters)
    return (t_long - t_short) / (iters - n1) * 1e3


def measure_throughput(fn, pixels: int, iters: int = 50):
    """(mean msec, MP/s), readback-fenced per call."""
    ms = measure(fn, iters)
    return ms, pixels / ms / 1e3


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vip_trace"):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
