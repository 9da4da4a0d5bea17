"""On-chip A/B of the fused whole-iteration CGNN kernel vs the shipped
paths, at the nrx_rt real-time operating point (batch 1, 132 PRB, bf16).

Variants:
  xla     - plain XLA convs (round-1 baseline path)
  fconv   - fused sepconv stacks only (round-2 shipped serving path)
  fiter   - fused whole-iteration kernel + fused init stack
            (w_blk sweep via --wblk)

Prints serialized per-slot device time for each variant; optionally
batch-16 throughput for the winners (--b16).

Usage: python scripts/bench_fused_iter.py [--wblk 128 256] [--b16]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--length", type=int, default=100)
    ap.add_argument("--wblk", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--b16", action="store_true")
    ap.add_argument("--lean", action="store_true",
                    help="only xla/fconv/fiter_w* (skip lp/ro variants; "
                         "whole-grid w_blk>=W compiles take ~8 min each "
                         "— keep chip windows lean)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.rx.neural_rx import NeuralPUSCHReceiver
    from neural_rx_tpu.rx.cgnn import cgnn_apply
    from neural_rx_tpu.utils.profiling import chained_device_time_ms

    p = Parameters(args.config, system="nrx", training=False)
    rx = NeuralPUSCHReceiver(
        p.transmitters, num_rx_ant=p.num_rx_antennas,
        max_num_tx=p.max_num_tx, num_it=p.num_nrx_iter, d_s=p.d_s,
        num_units_init=p.num_units_init, num_units_agg=p.num_units_agg,
        num_units_state=p.num_units_state,
        num_units_readout=p.num_units_readout,
        var_mcs_masking=p.mcs_var_mcs_masking,
        initial_chest="ls", mask_pilots=False, nrx_dtype=jnp.bfloat16)
    params = rx.init_params(jax.random.PRNGKey(0))
    sc = rx.rg.num_subcarriers

    variants = [("xla", {}),
                ("fconv", {"fused_convs": True})]
    for w in args.wblk:
        variants.append((f"fiter_w{w}", {"fused_convs": True,
                                         "fused_iteration": True,
                                         "fused_iter_wblk": w}))
        # (the former fiter_mxu probe was removed: since the round-4
        # conv_mxu fallback fix, cgnn_apply routes conv_mxu+fused_iter
        # to the fconv path, so the variant would mislabel fconv)
        if args.lean:
            continue
        variants.append((f"fiter_lp_w{w}", {"fused_convs": True,
                                            "fused_iteration": True,
                                            "fused_iter_wblk": w,
                                            "stencil_lp": True}))
        # NOTE: *_ro variants skip the chest readout (LLR-only output)
        # and so compute strictly LESS than the reference's deployed
        # engine (which returns h_hat too, neural_rx.py:1773-1812) —
        # not comparable to its 1.275 ms baseline; kernel-dev A/B only
        variants.append((f"fiter_ro_noche_w{w}", {"fused_convs": True,
                                                  "fused_iteration": True,
                                                  "fused_iter_wblk": w,
                                                  "fused_readout": True}))
        variants.append((f"fiter_lpro_noche_w{w}", {"fused_convs": True,
                                                    "fused_iteration": True,
                                                    "fused_iter_wblk": w,
                                                    "stencil_lp": True,
                                                    "fused_readout": True}))

    def make_fn(cfg, batch):
        def fn(y_planar):
            y = y_planar[..., 0] + 1j * y_planar[..., 1]
            y_in, h_in = rx._prepare_inputs(y)
            llrs, _ = cgnn_apply(params["cgnn"], cfg, y_in,
                                 jnp.asarray(rx.pe), h_in,
                                 jnp.ones((batch, rx.max_num_tx)),
                                 jnp.ones((batch, rx.max_num_tx, 1)),
                                 dtype=jnp.bfloat16)
            return llrs[-1][0]
        return fn

    y1 = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 14, sc, 2)), jnp.float32)
    # raised-budget compiles (whole-grid kernels need a bigger scoped
    # vmem): NRX_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536".
    # XLA_FLAGS cannot carry this flag (client-side parse aborts on
    # backend-only flags); per-executable compiler_options work.
    copts = None
    if os.environ.get("NRX_COMPILER_OPTS"):
        copts = dict(kv.split("=", 1)
                     for kv in os.environ["NRX_COMPILER_OPTS"].split(","))

    def run_once(fn, y):
        if copts:
            return np.asarray(jax.jit(fn).lower(y).compile(
                compiler_options=copts)(y), np.float32)
        return np.asarray(jax.jit(fn)(y), np.float32)

    results = {}
    out_ref = None
    for name, over in variants:
        cfg = dataclasses.replace(rx.cgnn_cfg, **over)
        fn = make_fn(cfg, 1)
        try:
            out = run_once(fn, y1)
        except Exception as e:  # Mosaic lowering failures are per-variant
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[name] = None
            continue
        if out_ref is None:
            out_ref = out
        else:
            print(f"{name}: max|diff vs xla| = "
                  f"{np.abs(out - out_ref).max():.4f} (bf16)", flush=True)
        if args.cpu:
            continue
        ms = chained_device_time_ms(fn, y1, length=args.length, reps=5)
        results[name] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms/slot (serialized, batch 1)",
              flush=True)

    if args.b16 and not args.cpu:
        y16 = jnp.tile(y1, (16, 1, 1, 1, 1))
        for name, over in variants:
            if results.get(name) is None and name in results:
                continue
            cfg = dataclasses.replace(rx.cgnn_cfg, **over)
            fn = make_fn(cfg, 16)
            try:
                ms = chained_device_time_ms(fn, y16, length=30, reps=3)
            except Exception as e:
                print(f"{name} batch16: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            results[f"{name}_b16"] = round(ms, 4)
            print(f"{name} batch16: {ms:.4f} ms/call = "
                  f"{16e3 / ms:.0f} slots/s", flush=True)

    print(json.dumps({"config": args.config,
                      "slot_device_ms": results}))


if __name__ == "__main__":
    main()
