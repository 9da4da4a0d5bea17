"""On-chip A/B of serialized serving engines (round-5 perf tail).

Loads the offline-AOT engine artifacts (scripts/offline_aot_engine.py)
and measures each chain's serialized device time via the
short-chain-subtraction method (see bench_deploy_best.py). Falls back
to on-chip compilation for any artifact the runtime refuses.

Usage: python scripts/bench_engines_ab.py [--safe-ms 0.66]
ONE chip client at a time.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

L, L16 = 100, 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--safe-ms", type=float, default=None,
                    help="known default-engine ms/slot (skips its "
                         "measurement)")
    ap.add_argument("--engines", nargs="*",
                    default=["wholegrid", "mega", "w192b16",
                             "megab16"])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from neural_rx_tpu.deploy.aot import load_compiled

    import __graft_entry__ as g
    fn, (params, y1) = g.entry()
    yb16 = jnp.tile(y1, (16, 1, 1, 1, 1))

    def chain(f, n):
        def body(y, _):
            out = f(params, y)
            acc = sum(jnp.mean(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out))
            return y + 1e-6 * acc, ()

        def run(y):
            y_out, _ = jax.lax.scan(body, y, None, length=n)
            return jnp.mean(y_out)
        return run

    def med(f, x, reps=10):
        np.asarray(f(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # default-engine short chain: the per-measurement overhead anchor
    short_safe = jax.jit(chain(fn, 1)).lower(y1).compile()
    t_short = med(short_safe, y1)
    if args.safe_ms is None:
        long_safe = jax.jit(chain(fn, L)).lower(y1).compile()
        safe_ms = (med(long_safe, y1) - t_short) * 1e3 / (L - 1)
    else:
        safe_ms = args.safe_ms
    print(json.dumps({"engine": "safe_default", "dev_ms": round(
        safe_ms, 4)}), flush=True)

    specs = {
        "wholegrid": (f"deploy_out/best_chain_b1_L{L}_"
                      "NRX_DEPLOY_WBLK_B1=4096-NRX_DEPLOY_MEGA=.npe",
                      y1, L, {"NRX_DEPLOY_WBLK_B1": "4096"},
                      "xla_tpu_scoped_vmem_limit_kib=65536"),
        "mega": (f"deploy_out/best_chain_b1_L{L}_"
                 "NRX_DEPLOY_WBLK_B1=-NRX_DEPLOY_MEGA=1.npe",
                 y1, L, {"NRX_DEPLOY_MEGA": "1"},
                 "xla_tpu_scoped_vmem_limit_kib=98304"),
        "w192b16": (f"deploy_out/best_chain_b16_L{L16}_"
                    "NRX_DEPLOY_WBLK_B16=192.npe",
                    yb16, L16, {"NRX_DEPLOY_WBLK_B16": "192"},
                    "xla_tpu_scoped_vmem_limit_kib=98304"),
        "megab16": (f"deploy_out/best_chain_b16_L{L16}_"
                    "NRX_DEPLOY_WBLK_B16=.npe",
                    yb16, L16, {"NRX_DEPLOY_MEGA": "1"},
                    "xla_tpu_scoped_vmem_limit_kib=98304"),
    }
    for name in args.engines:
        path, y, n, env, copts = specs[name]
        t0 = time.time()
        exe = None
        src = "artifact"
        if os.path.exists(path):
            try:
                exe = load_compiled(path)
            except Exception as e:
                print(f"# {name}: artifact load failed: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
        if exe is None:
            src = "fresh-compile"
            for k in ("NRX_DEPLOY_WBLK_B1", "NRX_DEPLOY_WBLK_B16",
                      "NRX_DEPLOY_MEGA"):
                os.environ.pop(k, None)
            os.environ.update(env)
            import importlib
            importlib.reload(g)
            fn2, _ = g.entry()
            opts = (dict(kv.split("=", 1) for kv in copts.split(","))
                    if copts else None)
            lowered = jax.jit(chain(fn2, n)).lower(y)
            try:
                exe = (lowered.compile(compiler_options=opts) if opts
                       else lowered.compile())
            except Exception as e:
                print(json.dumps({"engine": name, "error":
                                  str(e)[:300]}), flush=True)
                continue
            # persist the chip-compiled executable: the axon runtime
            # rejects topology-compiled artifacts (measured 2026-08-21),
            # so the loadable artifact must come from a chip compile
            try:
                from neural_rx_tpu.deploy.aot import serialize_compiled
                serialize_compiled(exe, path)
                print(f"# {name}: serialized chip-compiled -> {path}",
                      file=sys.stderr, flush=True)
                if y.shape[0] > 1:
                    sh = jax.jit(chain(fn2, 1)).lower(y).compile(
                        compiler_options=(opts or None))
                    serialize_compiled(sh, path + ".short")
            except Exception as e:
                print(f"# {name}: serialization failed: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
        load_s = time.time() - t0
        try:
            if y.shape[0] == 1:
                ms = (med(exe, y) - t_short) * 1e3
                dev_ms = (ms + safe_ms) / n
                out = {"engine": name, "dev_ms": round(dev_ms, 4)}
            else:
                # b16: subtract a 1-length chain of the same engine if
                # present, else approximate with t_short
                short_path = path + ".short"
                if os.path.exists(short_path):
                    sh = load_compiled(short_path)
                    t_s = med(sh, y)
                else:
                    t_s = t_short
                ms = (med(exe, y) - t_s) * 1e3 / (n - 1)
                out = {"engine": name, "dev_ms_per_call": round(ms, 4),
                       "slots_per_s": round(16e3 / ms, 1)}
            out["setup_s"] = round(load_s, 1)
            out["source"] = src
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"engine": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
