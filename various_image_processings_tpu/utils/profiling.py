"""Benchmark timing utilities.

Counterpart of the reference's ``MEASURE`` macro
(sample/benchmark/main.cpp:20-33): N+1 runs, first discarded as warmup,
mean wall-clock msec — plus MP/s, and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


def measure(fn, iters: int = 50) -> float:
    """Mean msec per call over `iters` runs, first (compile) run discarded.
    `fn` must return a jax array (or pytree) to fence on."""
    out = fn()
    jax.block_until_ready(out)
    total = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        total += time.perf_counter() - t0
    return total / iters * 1e3


def measure_throughput(fn, pixels: int, iters: int = 50):
    """(mean msec, MP/s) with one fence around the whole loop — removes
    per-call dispatch latency, like queueing kernels back-to-back on a CUDA
    stream (src/bilateral_texture_filter_impl.cu:205-211)."""
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, pixels / dt / 1e6


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vip_trace"):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
