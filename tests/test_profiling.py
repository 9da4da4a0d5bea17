"""Tunnel-safe timing helpers (utils/profiling.py).

block_until_ready is a no-op through the axon device tunnel, so all
timing forces device->host transfers; the chained scan measures
serialized per-call device time (trtexec "GPU compute" analog).
"""
import jax
import jax.numpy as jnp

from neural_rx_tpu.utils.profiling import (chained_device_time_ms,
                                           time_fn, tunnel_rtt_ms)


def test_time_fn_returns_stats():
    out = time_fn(jax.jit(lambda x: x * 2.0), jnp.ones(16), iters=5,
                  warmup=1)
    assert set(out) == {"p50_ms", "p99_ms", "mean_ms"}
    assert 0 < out["p50_ms"] <= out["p99_ms"]


def test_chained_device_time_positive_and_scales():
    def fn(y):
        return jnp.tanh(y @ y.T)

    y = jnp.ones((64, 64))
    t = chained_device_time_ms(fn, y, length=20, reps=3)
    assert 0 < t < 1e3


def test_tunnel_rtt_small_on_cpu():
    rtt = tunnel_rtt_ms(iters=5)
    assert 0 < rtt < 100
