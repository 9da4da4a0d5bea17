"""Child process for bench.py's best-engine attempt.

Measures the whole-grid deployed engine with ONE expensive compile:
the standard chained metric needs a short chain only to cancel the
dispatch/transfer overhead OH, and OH is engine-independent, so the
short chain runs the cheap DEFAULT engine instead:

    med(long_best)  = OH + L * t_best
    med(short_safe) = OH + 1 * t_safe
    t_best = (med(long_best) - med(short_safe) + t_safe) / L

with t_safe = the parent's already-measured default-engine ms/slot
(NRX_SAFE_MS); its error enters divided by L. The whole-grid compile
runs ~8.5 min on v5e — compiling both chain lengths (as
chained_device_time_ms does) blew the parent's timeout, which is why
this exists. Prints one JSON line {dev_ms, compile_s}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

L = 100


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    t_safe = float(os.environ["NRX_SAFE_MS"])
    copts = dict(kv.split("=", 1)
                 for kv in os.environ["NRX_COMPILER_OPTS"].split(","))

    # fn_best: env-selected engine (whole-grid); fn_safe: default.
    # NOTE the engine env vars are read INSIDE fn at TRACE time, so
    # the best chain must be LOWERED while they are still set (the
    # first version popped them before lowering and silently measured
    # the safe engine twice — caught by the fill10 on-chip debug run:
    # dev_ms ~= safe and compile_s 12s instead of ~500s).
    import __graft_entry__ as g
    fn_best, (params, y_example) = g.entry()

    def chain(fn, n):
        def body(y, _):
            out = fn(params, y)
            # chain every output leaf: the engine returns (llr, h_hat)
            # and feeding back only one would DCE the other readout
            acc = sum(jnp.mean(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out))
            return y + 1e-6 * acc, ()

        def run(y):
            y_out, _ = jax.lax.scan(body, y, None, length=n)
            return jnp.mean(y_out)
        return run

    t0 = time.time()
    long_best = jax.jit(chain(fn_best, L)).lower(y_example).compile(
        compiler_options=copts)
    compile_s = time.time() - t0

    for k in ("NRX_DEPLOY_WBLK_B1", "NRX_DEPLOY_WBLK_B16"):
        os.environ.pop(k, None)
    fn_safe, _ = g.entry()
    short_safe = jax.jit(chain(fn_safe, 1)).lower(y_example).compile()
    np.asarray(short_safe(y_example))
    np.asarray(long_best(y_example))

    def med(f, reps=10):
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            np.asarray(f(y_example))
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts))

    delta_ms = (med(long_best) - med(short_safe)) * 1e3
    dev_ms = (delta_ms + t_safe) / L
    print(json.dumps({"dev_ms": round(dev_ms, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
