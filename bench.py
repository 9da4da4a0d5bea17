"""Single-chip benchmark: nrx_rt per-slot inference latency.

Measures the deployed receiver surface (LS estimate + 2-iteration CGNN +
LLR readout + chest readout, returning (llr, h_hat) exactly like the
reference's exported engine, neural_rx.py:1796-1812) at the reference's
real-time operating point: batch 1,
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

    # single-slot scalar-output fn: full compute, 4-byte transfer.
    # Sum over EVERY output leaf — the engine returns (llr, h_hat) like
    # the reference's (neural_rx.py:1796-1812); consuming only one would
    # let XLA DCE the other readout out of the timed executable.
    fn_scalar = jax.jit(
        lambda p, y: sum(jnp.sum(leaf.astype(jnp.float32))
                         for leaf in jax.tree.leaves(fn(p, y))))

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

    extra = {
        "dispatch_sync_p50_ms": round(disp_p50, 4),
        "dispatch_sync_p99_ms": round(disp_p99, 4),
        "tunnel_rtt_ms": round(rtt_ms, 4),
        "slots_per_s_pipelined": round(slots_per_s, 1),
        "batch16_device_ms_per_call": round(dev_b16_ms, 4),
        "slots_per_s_batch16": round(slots_per_s_b16, 1),
        "compile_s": round(compile_s, 1),
        "baseline": "RTX3090 TRT fp16 1.275 ms median GPU compute",
        "method": "data-dependency-chained lax.scan (no pipelining)",
    }

    def emit(ms, ex):
        # device-limited batch-1 streaming throughput: the exact framing
        # of the reference's "782.7 qps" (= 1/1.275 ms TRT compute time).
        # Per-slot device time at batch 1 beats all batch-16 engines
        # (0.91 ms/slot at b16 w192), so real-time serving streams b1.
        ex = dict(ex, slots_per_s_b1_stream=round(1e3 / ms, 1))
        print(json.dumps({
            "metric": "nrx_rt_slot_device_time_p50_132prb_b1",
            "value": round(ms, 4), "unit": "ms",
            "vs_baseline": round(BASELINE_MS / ms, 2),
            "extra": ex,
        }), flush=True)

    # SAFE line first (default engine config, stock compile budget): if
    # anything below is cut off by an outer timeout, this line stands
    emit(dev_ms, extra)

    # Then try the round-4 A/B winners (whole-grid halo-free iteration
    # at batch 1 under a 64 MB scoped-vmem budget, w_blk=192 at batch
    # 16; logs/round4_perf.log 2026-08-20). The whole-grid executable
    # compiles for ~8 min, so it runs in a KILLABLE subprocess with a
    # hard timeout; on success a second (improved) JSON line replaces
    # the safe one for tail-parsing consumers.
    import os
    import subprocess
    import sys
    if os.environ.get("NRX_BENCH_NO_BEST") == "1":
        return
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "bench_deploy_best.py")],
            env=dict(
                os.environ,
                NRX_DEPLOY_WBLK_B1="4096",
                NRX_DEPLOY_WBLK_B16="192",
                NRX_SAFE_MS=str(dev_ms),
                NRX_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536",
            ),
            capture_output=True, text=True, timeout=1100)
        best = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        # diagnostics on stderr only (stdout keeps the json-line
        # contract); the safe line above already stands
        out = getattr(locals().get("r"), "stdout", "")
        err = getattr(locals().get("r"), "stderr", "")
        print(f"best-engine attempt failed: {type(e).__name__}: "
              f"{str(e)[:200]}\nchild stdout tail: {out[-400:]}\n"
              f"child stderr tail: {err[-800:]}", file=sys.stderr)
        return
    if not best.get("dev_ms"):
        return
    if best["dev_ms"] < dev_ms:
        ex = dict(extra)
        names = {"wholegrid": "whole-grid fused iteration (64MB scoped "
                              "vmem)",
                 "mega": "whole-receiver mega-kernel (init+iterations+"
                         "readouts in one pallas_call, 96MB scoped "
                         "vmem)"}
        ex["engine"] = ("batch-1: "
                        + names.get(best.get("engine", "wholegrid"),
                                    best.get("engine", "?")))
        ex["fallback_engine_ms"] = round(dev_ms, 4)
        ex["compile_s"] = round(best.get("compile_s", 0.0), 1)
        # only adopt the child's b16 engine if it actually beats the
        # safe engine's b16 (run 2026-08-21: child w192 measured 16.29
        # ms/call vs safe 14.60 — engine choice must not regress b16)
        if best.get("dev_b16_ms") and best["dev_b16_ms"] < dev_b16_ms:
            ex["batch16_device_ms_per_call"] = round(best["dev_b16_ms"], 4)
            ex["slots_per_s_batch16"] = round(
                16e3 / best["dev_b16_ms"], 1)
            if best.get("engine_b16"):
                ex["engine_b16"] = best["engine_b16"]
        emit(best["dev_ms"], ex)


if __name__ == "__main__":
    main()
