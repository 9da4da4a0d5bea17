"""AOT compilation of fixed-shape receiver executables per PRB bucket.

Replaces the reference's TensorRT engine build with min/opt/max
dynamic-shape profiles (scripts/export_onnx.py:196-212): XLA wants
static shapes, so we compile one executable per PRB bucket and dispatch
to the smallest bucket that fits (masking unused subcarriers). This is
the same strategy the reference's LMMSE baselines use for large
bandwidths (fixed chunk sizes) and is how the TRT profile set is
actually consumed by Aerial (a handful of discrete shapes).
"""

from __future__ import annotations

import time

import numpy as np
import jax


DEFAULT_PRB_BUCKETS = (4, 16, 32, 64, 132, 273)


class BucketedReceiver:
    """Per-bucket AOT-compiled Aerial receivers.

    build(cfg_builder) compiles fn(params, *aerial_inputs) for each
    bucket; `run` dispatches by n_prb.
    """

    def __init__(self, make_receiver, params, batch_size: int = 1,
                 buckets=DEFAULT_PRB_BUCKETS):
        """make_receiver: n_prb -> (callable, example_inputs)."""
        self.buckets = tuple(sorted(buckets))
        self.compiled = {}
        self.params = params
        self.compile_times = {}
        for n_prb in self.buckets:
            fn, example = make_receiver(n_prb)
            t0 = time.time()
            lowered = jax.jit(fn).lower(params, *example)
            self.compiled[n_prb] = lowered.compile()
            self.compile_times[n_prb] = time.time() - t0

    def bucket_for(self, n_prb: int) -> int:
        for b in self.buckets:
            if n_prb <= b:
                return b
        raise ValueError(f"{n_prb} PRBs exceeds largest bucket")

    def run(self, n_prb: int, *inputs):
        b = self.bucket_for(n_prb)
        if n_prb != b:
            raise NotImplementedError(
                "pad inputs to the bucket size before dispatch")
        return self.compiled[b](self.params, *inputs)


def measure_latency(compiled, params, inputs, iters: int = 100):
    """p50/p99 single-dispatch latency + pipelined throughput.

    Syncs with device->host transfers: block_until_ready does not block
    through remote-device tunnels (see utils/profiling.py)."""
    from ..utils.profiling import force_sync
    force_sync(compiled(params, *inputs))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(compiled(params, *inputs))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        compiled(params, *inputs)
    force_sync(compiled(params, *inputs))
    thr = iters / (time.perf_counter() - t0)
    return {"p50_ms": float(np.percentile(lat_ms, 50)),
            "p99_ms": float(np.percentile(lat_ms, 99)),
            "slots_per_s": float(thr)}
