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

    # TRT-plan analog: a previously serialized COMPILED executable of
    # the best chain loads in seconds instead of the ~6-minute XLA
    # compile (deploy/aot.serialize_compiled). Cache key = engine knobs.
    from neural_rx_tpu.deploy.aot import serialize_compiled, load_compiled
    art_dir = os.environ.get("NRX_ENGINE_CACHE", "deploy_out")
    tag = "-".join(f"{k}={os.environ.get(k, '')}"
                   for k in ("NRX_DEPLOY_WBLK_B1", "NRX_DEPLOY_MEGA"))
    art = os.path.join(art_dir, f"best_chain_b1_L{L}_{tag}.npe")
    long_best = None
    t0 = time.time()
    if os.path.exists(art):
        try:
            long_best = load_compiled(art)
            print(f"loaded serialized engine {art}", file=sys.stderr)
        except Exception as e:  # stale/foreign artifact: recompile
            print(f"engine artifact load failed ({e}); recompiling",
                  file=sys.stderr)
    if long_best is None:
        long_best = jax.jit(chain(fn_best, L)).lower(y_example).compile(
            compiler_options=copts)
        try:
            os.makedirs(art_dir, exist_ok=True)
            n = serialize_compiled(long_best, art)
            print(f"serialized engine -> {art} ({n} bytes)",
                  file=sys.stderr)
        except Exception as e:
            print(f"engine serialization unsupported here: {e}",
                  file=sys.stderr)
    compile_s = time.time() - t0

    # batch-16 best engine (blocked w192 + in-kernel readouts): its own
    # chained executable, also artifact-cached. Lowered while the env
    # vars are still set (trace-time reads, see note above).
    L16 = 30
    yb16 = jnp.tile(y_example, (16, 1, 1, 1, 1))
    art16 = os.path.join(
        art_dir, f"best_chain_b16_L{L16}_"
        f"NRX_DEPLOY_WBLK_B16={os.environ.get('NRX_DEPLOY_WBLK_B16', '')}"
        ".npe")
    long_b16 = short_b16 = None
    t1 = time.time()
    try:
        if os.path.exists(art16):
            try:
                long_b16 = load_compiled(art16)
                short_b16 = load_compiled(art16 + ".short")
            except Exception:
                long_b16 = short_b16 = None
        if long_b16 is None:
            # 96 MB scoped-vmem: at batch 16 XLA stacks the kernel's
            # [16,14,1728,56] state outputs in vmem inside the scan
            opts16 = {"xla_tpu_scoped_vmem_limit_kib": "98304"}
            long_b16 = jax.jit(chain(fn_best, L16)).lower(
                yb16).compile(compiler_options=opts16)
            short_b16 = jax.jit(chain(fn_best, 1)).lower(
                yb16).compile(compiler_options=opts16)
            try:
                serialize_compiled(long_b16, art16)
                serialize_compiled(short_b16, art16 + ".short")
            except Exception:
                pass
    except Exception as e:
        print(f"b16 best engine unavailable: {e}", file=sys.stderr)
    compile_b16_s = time.time() - t1

    for k in ("NRX_DEPLOY_WBLK_B1", "NRX_DEPLOY_WBLK_B16",
              "NRX_DEPLOY_MEGA"):
        os.environ.pop(k, None)
    fn_safe, _ = g.entry()
    short_safe = jax.jit(chain(fn_safe, 1)).lower(y_example).compile()
    np.asarray(short_safe(y_example))
    np.asarray(long_best(y_example))

    def med(f, x, reps=10):
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts))

    t_short_safe = med(short_safe, y_example)
    delta_ms = (med(long_best, y_example) - t_short_safe) * 1e3
    dev_ms = (delta_ms + t_safe) / L
    engine = "wholegrid"

    # secondary b1 candidate: the MEGA engine artifact (one kernel for
    # the whole receiver). Load-only — if its artifact is absent or
    # rejected, the primary stands; measuring a loaded engine costs
    # ~10 chained calls.
    alt = os.path.join(
        art_dir, f"best_chain_b1_L{L}_NRX_DEPLOY_WBLK_B1="
        "-NRX_DEPLOY_MEGA=1.npe")
    if os.path.abspath(alt) != os.path.abspath(art) and \
            os.path.exists(alt):
        try:
            long_mega = load_compiled(alt)
            np.asarray(long_mega(y_example))
            mega_ms = ((med(long_mega, y_example) - t_short_safe) * 1e3
                       + t_safe) / L
            print(f"mega engine: {mega_ms:.4f} ms/slot vs "
                  f"{dev_ms:.4f} wholegrid", file=sys.stderr)
            if mega_ms < dev_ms:
                dev_ms, engine = mega_ms, "mega"
        except Exception as e:
            print(f"mega artifact unusable: {str(e)[:200]}",
                  file=sys.stderr)

    out = {"dev_ms": round(dev_ms, 4), "compile_s": round(compile_s, 1),
           "engine": engine}
    ms16 = None
    if long_b16 is not None:
        np.asarray(short_b16(yb16))
        np.asarray(long_b16(yb16))
        ms16 = (med(long_b16, yb16) - med(short_b16, yb16)) * 1e3 \
            / (L16 - 1)
        out["engine_b16"] = "w192"

    # secondary b16 candidate: the MEGA engine artifact at batch 16.
    # Load-only (like the b1 mega alt): absent/rejected -> w192 stands.
    alt16 = os.path.join(
        art_dir, f"best_chain_b16_L{L16}_NRX_DEPLOY_WBLK_B16=.npe")
    if os.path.exists(alt16):
        try:
            mega16 = load_compiled(alt16)
            try:
                sh16 = load_compiled(alt16 + ".short")
            except Exception:
                sh16 = short_b16  # overhead anchor is engine-independent
            if sh16 is None:
                raise RuntimeError("no short-chain anchor available")
            np.asarray(mega16(yb16))
            np.asarray(sh16(yb16))
            mega16_ms = (med(mega16, yb16) - med(sh16, yb16)) * 1e3 \
                / (L16 - 1)
            print(f"mega b16: {mega16_ms:.4f} ms/call vs "
                  f"{ms16} w192", file=sys.stderr)
            if ms16 is None or mega16_ms < ms16:
                ms16 = mega16_ms
                out["engine_b16"] = "mega"
        except Exception as e:
            print(f"mega b16 artifact unusable: {str(e)[:200]}",
                  file=sys.stderr)

    if ms16 is not None:
        out["dev_b16_ms"] = round(ms16, 4)
        out["compile_b16_s"] = round(compile_b16_s, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
