"""Single-chip benchmark: nrx_rt per-slot inference latency.

Measures the deployed receiver surface (LS estimate + 2-iteration CGNN +
LLR readout) at the reference's real-time operating point: batch 1,
132 PRBs (1584 subcarriers), 14 OFDM symbols, 4 rx antennas, 2 users,
bf16 compute — the same scope as the reference's TensorRT fp16 engine
(BASELINE.md: mean 1.275 ms GPU compute on RTX 3090, ~1 ms target).

Prints ONE JSON line: p50 per-slot latency with vs_baseline =
baseline_ms / ours_ms (speedup factor, >1 is faster than baseline).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MS = 1.275  # reference nrx_rt TRT fp16 median GPU compute time


def main():
    import __graft_entry__ as g
    fn, (params, y_example) = g.entry()
    fn_j = jax.jit(fn)

    # compile
    t0 = time.time()
    out = fn_j(params, y_example)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # single-dispatch latency (block every call): true per-slot latency
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        out = fn_j(params, y_example)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    p99 = float(np.percentile(lat_ms, 99))

    # pipelined throughput (dispatch ahead, block once)
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(params, y_example)
    jax.block_until_ready(out)
    slots_per_s = n / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "nrx_rt_slot_latency_p50_132prb_b1",
        "value": round(p50, 4), "unit": "ms",
        "vs_baseline": round(BASELINE_MS / p50, 2),
        "extra": {"p99_ms": round(p99, 4),
                  "slots_per_s_pipelined": round(slots_per_s, 1),
                  "compile_s": round(compile_s, 1),
                  "baseline": "RTX3090 TRT fp16 1.275 ms median"},
    }))


if __name__ == "__main__":
    main()
