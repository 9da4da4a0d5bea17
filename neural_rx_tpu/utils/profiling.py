"""Profiling helpers: jax.profiler traces and wall-clock kernel timing.

Replaces the reference's trtexec/Nsight-delegated latency profiling
(SURVEY.md §5): `profile_trace` captures an XLA/TPU trace viewable in
TensorBoard or Perfetto; `time_fn` measures p50/p99 dispatch latency.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 50, warmup: int = 3):
    """p50/p99/mean latency of a (jitted) callable, blocking each call."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    return {"p50_ms": float(np.percentile(lat_ms, 50)),
            "p99_ms": float(np.percentile(lat_ms, 99)),
            "mean_ms": float(lat_ms.mean())}
