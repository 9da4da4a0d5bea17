"""Latency vs CGNN depth (reference nrx_architecture.ipynb cell 32).

Measures serialized per-slot device execution time of the deployed
receiver surface for num_it = 1..8 on the nrx_large architecture at the
real-time operating point (132 PRB, 14 symbols, 4 rx ant, 2 UE, batch 1,
bf16), via a data-dependency chain (see utils/profiling.py).
Reference numbers (A100, TRT): 0.61/0.96/1.32/1.67/2.05/2.41/2.77/3.11
ms median for depth 1..8 (SURVEY.md §6.1).

Usage: python scripts/bench_depth.py [--config nrx_large]
       [--depths 1 2 4 8] [--reps 50]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REFERENCE_MS = {1: 0.61, 2: 0.96, 3: 1.32, 4: 1.67, 5: 2.05, 6: 2.41,
                7: 2.77, 8: 3.11}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_large")
    ap.add_argument("--depths", type=int, nargs="*",
                    default=[1, 2, 3, 4, 5, 6, 7, 8])
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--variant", default="fiter",
                    choices=["xla", "fconv", "fiter", "fiter_mxu"],
                    help="serving path: fused whole-iteration kernel "
                         "(default; round-2 sweeps mistakenly ran the "
                         "raw XLA path and lost to the reference at "
                         "depth), optionally with MXU folded-tap convs")
    ap.add_argument("--wblk", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.rx.neural_rx import NeuralPUSCHReceiver
    from neural_rx_tpu.rx.cgnn import cgnn_apply

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
    over = {"xla": {},
            "fconv": {"fused_convs": True},
            "fiter": {"fused_convs": True, "fused_iteration": True,
                      "fused_iter_wblk": args.wblk},
            "fiter_mxu": {"fused_convs": True, "fused_iteration": True,
                          "fused_iter_wblk": args.wblk,
                          "conv_mxu": True}}[args.variant]
    variant_cfg = dataclasses.replace(rx.cgnn_cfg, **over)
    rg = p.transmitters[0].resource_grid
    sc = rg.num_subcarriers
    y_example = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 14, sc, 2)),
        jnp.float32)

    results = {}
    paths = {}
    for depth in args.depths:
        if depth > p.num_nrx_iter:
            continue
        # per-depth cfg: a prior depth's fconv fallback must not leak
        # into later depths (they would silently bench fconv while the
        # JSON still labels the requested variant)
        cfg = variant_cfg
        paths[depth] = args.variant

        def fn(params, y_planar, depth=depth):
            y = y_planar[..., 0] + 1j * y_planar[..., 1]
            y_in, h_in = rx._prepare_inputs(y)
            llrs, _ = cgnn_apply(params["cgnn"], cfg, y_in,
                                 jnp.asarray(rx.pe), h_in,
                                 jnp.ones((1, rx.max_num_tx)),
                                 jnp.ones((1, rx.max_num_tx, 1)),
                                 num_it=depth, dtype=jnp.bfloat16)
            return llrs[-1][0]

        from neural_rx_tpu.utils.profiling import chained_device_time_ms
        t0 = time.time()
        try:
            np.asarray(jax.jit(lambda pr, y: jnp.mean(
                fn(pr, y).astype(jnp.float32)))(params, y_example))
        except Exception as e:  # per-depth: report, fall back to fconv
            print(f"depth {depth}: {args.variant} failed "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)
            if args.variant != "fconv":
                cfg = dataclasses.replace(
                    rx.cgnn_cfg, fused_convs=True)
                paths[depth] = "fconv"
                print(f"depth {depth}: falling back to fconv", flush=True)
                try:
                    np.asarray(jax.jit(lambda pr, y: jnp.mean(
                        fn(pr, y).astype(jnp.float32)))(params, y_example))
                except Exception as e2:
                    print(f"depth {depth}: fconv also failed: {e2}",
                          flush=True)
                    continue
            else:
                continue
        compile_s = time.time() - t0
        # serialized device time (trtexec "GPU compute" analog; plain
        # block_until_ready does not block through the axon tunnel)
        p50 = chained_device_time_ms(lambda y: fn(params, y), y_example,
                                     length=50,
                                     reps=max(3, args.reps // 10))
        ref = REFERENCE_MS.get(depth)
        results[depth] = p50
        print(f"depth {depth}: p50 {p50:.3f} ms (compile {compile_s:.0f}s)"
              + (f" | reference {ref} ms ({ref / p50:.1f}x)" if ref
                 else ""), flush=True)
    print(json.dumps({"variant": args.variant,
                      "path_by_depth": paths,
                      "latency_ms_by_depth": results}))


if __name__ == "__main__":
    main()
