"""Single-chip benchmark: nrx_rt per-slot inference latency.

Measures the deployed receiver surface (LS estimate + 2-iteration CGNN +
LLR readout) at the reference's real-time operating point: batch 1,
132 PRBs (1584 subcarriers), 14 OFDM symbols, 4 rx antennas, 2 users,
bf16 compute — the same scope as the reference's TensorRT fp16 engine
(BASELINE.md: mean 1.275 ms GPU compute on RTX 3090, ~1 ms target).

Timing through the axon TPU tunnel is subtle: `block_until_ready` does
NOT block (measured: an 19 s eval step "completes" in <1 ms), so every
measurement here forces a real device->host transfer. The headline
number is the *serialized device execution time per slot*, measured with
a data-dependency chain (`lax.scan` where slot i+1's input depends on
slot i's LLRs, so nothing can pipeline) — the direct analog of trtexec's
"GPU compute time" that the 1.275 ms baseline reports.

Prints ONE JSON line: p50 per-slot device time with vs_baseline =
baseline_ms / ours_ms (speedup factor, >1 is faster than baseline).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MS = 1.275  # reference nrx_rt TRT fp16 median GPU compute time


def _assert_device_reachable(timeout_s: int = 180):
    """The axon tunnel can die silently: clients block forever inside a
    native RPC (signals don't interrupt it), so probe in a killable
    subprocess and turn a dead link into a diagnostic JSON line instead
    of a hang."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import numpy, jax, jax.numpy as jnp;"
             "numpy.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1)));"
             "print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        if "ok" not in r.stdout:
            raise TimeoutError(r.stderr[-200:])
    except subprocess.TimeoutExpired:
        raise TimeoutError("device probe timed out") from None


def main():
    import __graft_entry__ as g
    from neural_rx_tpu.utils.profiling import (chained_device_time_ms,
                                               tunnel_rtt_ms)
    try:
        _assert_device_reachable()
    except TimeoutError:
        print(json.dumps({
            "metric": "nrx_rt_slot_device_time_p50_132prb_b1",
            "value": None, "unit": "ms", "vs_baseline": None,
            "extra": {"error": "device link unreachable (axon tunnel "
                               "down; it died mid-round, see STATUS.md)"},
        }))
        return
    fn, (params, y_example) = g.entry()

    # single-slot scalar-output fn: full compute, 4-byte transfer
    fn_scalar = jax.jit(
        lambda p, y: jnp.sum(fn(p, y).astype(jnp.float32)))

    t0 = time.time()
    np.asarray(fn_scalar(params, y_example))
    compile_s = time.time() - t0

    # tunnel round-trip floor: dispatch + tiny transfer of a trivial jit
    rtt_ms = tunnel_rtt_ms()

    # serialized device time per slot (trtexec "GPU compute" analog)
    dev_ms = chained_device_time_ms(lambda y: fn(params, y), y_example)

    # single-dispatch latency incl tunnel round trip (upper bound)
    disp = []
    for _ in range(100):
        t0 = time.perf_counter()
        np.asarray(fn_scalar(params, y_example))
        disp.append(time.perf_counter() - t0)
    disp_ms = np.asarray(disp) * 1e3
    disp_p50 = float(np.percentile(disp_ms, 50))
    disp_p99 = float(np.percentile(disp_ms, 99))

    # pipelined throughput: dispatch ahead, sync once on the last output
    n = 200
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn_scalar(params, y_example)
    np.asarray(fn_scalar(params, y_example))
    slots_per_s = n / (time.perf_counter() - t0)

    # batched serving throughput (slots/s/chip at batch 16): chained so
    # nothing pipelines across calls; batch parallelism only
    yb = jnp.tile(y_example, (16, 1, 1, 1, 1))
    dev_b16_ms = chained_device_time_ms(lambda y: fn(params, y), yb,
                                        length=50, reps=5)
    slots_per_s_b16 = 16.0 / (dev_b16_ms * 1e-3)

    print(json.dumps({
        "metric": "nrx_rt_slot_device_time_p50_132prb_b1",
        "value": round(dev_ms, 4), "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dev_ms, 2),
        "extra": {
            "dispatch_sync_p50_ms": round(disp_p50, 4),
            "dispatch_sync_p99_ms": round(disp_p99, 4),
            "tunnel_rtt_ms": round(rtt_ms, 4),
            "slots_per_s_pipelined": round(slots_per_s, 1),
            "batch16_device_ms_per_call": round(dev_b16_ms, 4),
            "slots_per_s_batch16": round(slots_per_s_b16, 1),
            "compile_s": round(compile_s, 1),
            "baseline": "RTX3090 TRT fp16 1.275 ms median GPU compute",
            "method": "data-dependency-chained lax.scan (no pipelining)",
        },
    }))


if __name__ == "__main__":
    main()
