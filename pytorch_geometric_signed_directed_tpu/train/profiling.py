"""Profiling / timing harness.

The reference has no profiler hooks (SURVEY.md §5).  Here: a context
manager around jax.profiler for TensorBoard-viewable TPU traces, and a
block_until_ready step timer for the edges/s metrics bench.py reports.
"""
import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 50, warmup: int = 2,
            **kwargs) -> float:
    """Median-free simple wall-clock: seconds per call, device-synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def edges_per_second(fn: Callable, num_edges: int, *args, iters: int = 50,
                     **kwargs) -> float:
    """Throughput of a graph op / train step in edges per second."""
    return num_edges / time_fn(fn, *args, iters=iters, **kwargs)
