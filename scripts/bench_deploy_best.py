"""Child process for bench.py's best-engine attempt: measures the
deployed entry() surface with the round-4 A/B winner config
(NRX_DEPLOY_WBLK_B1/_B16 + NRX_COMPILER_OPTS set by the parent) and
prints one JSON line {dev_ms, dev_b16_ms, compile_s}. Runs in its own
process so the parent can enforce a hard timeout on the ~8-minute
whole-grid compile (an in-flight axon remote compile is not
interruptible by signals from inside the process)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax.numpy as jnp
    import __graft_entry__ as g
    from neural_rx_tpu.utils.profiling import chained_device_time_ms

    fn, (params, y_example) = g.entry()
    t0 = time.time()
    dev_ms = chained_device_time_ms(lambda y: fn(params, y), y_example)
    compile_s = time.time() - t0
    out = {"dev_ms": round(dev_ms, 4), "compile_s": round(compile_s, 1)}
    try:
        yb = jnp.tile(y_example, (16, 1, 1, 1, 1))
        out["dev_b16_ms"] = round(chained_device_time_ms(
            lambda y: fn(params, y), yb, length=50, reps=5), 4)
    except Exception as e:
        out["b16_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
