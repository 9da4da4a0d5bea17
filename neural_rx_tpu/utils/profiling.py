"""Profiling helpers: jax.profiler traces and wall-clock kernel timing.

Replaces the reference's trtexec/Nsight-delegated latency profiling
(SURVEY.md §5): `profile_trace` captures an XLA/TPU trace viewable in
TensorBoard or Perfetto; `time_fn` measures p50/p99 dispatch latency;
`chained_device_time_ms` measures serialized per-call device execution
time (the analog of trtexec's "GPU compute time").

Timing caveat (axon TPU tunnel): `jax.block_until_ready` does NOT block
through the tunnel — an eval step measured at 19 s "completes" in <1 ms
under it. Every timing path here forces a real device->host transfer
(`force_sync`) instead.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force_sync(out):
    """Reliably wait for `out`: device->host transfer of every leaf."""
    return jax.tree.map(np.asarray, out)


def tunnel_rtt_ms(iters: int = 30) -> float:
    """Dispatch + tiny-transfer round-trip floor of the device link."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(1.0)
    np.asarray(f(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def time_fn(fn, *args, iters: int = 50, warmup: int = 3):
    """p50/p99/mean wall latency of a (jitted) callable, syncing each
    call with a full device->host transfer of the output. Includes the
    link round trip + output transfer; for pure device execution time
    use `chained_device_time_ms`."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    force_sync(out)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    return {"p50_ms": float(np.percentile(lat_ms, 50)),
            "p99_ms": float(np.percentile(lat_ms, 99)),
            "mean_ms": float(lat_ms.mean())}


def chained_device_time_ms(fn, y0, *, length: int = 100, reps: int = 10,
                           compiler_options: dict | None = None):
    """Serialized per-call device execution time of `fn(y) -> out`.

    Builds `lax.scan` chains where call i+1's input depends on call i's
    output (y' = y + 1e-6 * mean(out)), so the device cannot pipeline or
    elide calls, and only one scalar crosses the link. Returns
    (T_chain(length) - T_chain(1)) / (length - 1) in ms — the analog of
    trtexec's "GPU compute time" (reference real_time notebook).

    compiler_options: optional XLA backend options for the measured
    program (e.g. {"xla_tpu_scoped_vmem_limit_kib": "24576"}); also
    settable via NRX_COMPILER_OPTS="k=v,k=v" for A/B knobs in benches."""
    import os
    if compiler_options is None and os.environ.get("NRX_COMPILER_OPTS"):
        compiler_options = dict(
            kv.split("=", 1)
            for kv in os.environ["NRX_COMPILER_OPTS"].split(","))

    def make(n):
        def body(y, _):
            out = fn(y)
            # chain on EVERY output leaf: feeding only one back would
            # let XLA dead-code-eliminate the compute behind the others
            # (e.g. the chest readout of an (llr, h_hat) engine)
            acc = sum(jnp.mean(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out))
            return y + 1e-6 * acc, ()

        def run(y):
            y_out, _ = jax.lax.scan(body, y, None, length=n)
            return jnp.mean(y_out)
        if compiler_options:
            compiled = jax.jit(run).lower(y0).compile(
                compiler_options=compiler_options)
            return compiled
        return jax.jit(run)

    long, short = make(length), make(1)
    np.asarray(short(y0))  # compile
    np.asarray(long(y0))

    def med(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(y0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (med(long) - med(short)) / (length - 1) * 1e3
