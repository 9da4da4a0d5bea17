"""XLA vs pallas-fused sepconv stacks on the deployed nrx_rt surface.

Compares serialized per-slot device time (chained lax.scan; see
utils/profiling.py) of the CGNN forward at the real-time operating point
with `CGNNConfig.fused_convs` off/on. Run on the real chip (round 2);
`--cpu` uses pallas interpret mode and only checks numerics.

Usage: python scripts/bench_fused_convs.py [--config nrx_rt] [--cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--length", type=int, default=100)
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
    results = {}
    out_ref = None
    for fused in (False, True):
        rx = NeuralPUSCHReceiver(
            p.transmitters, num_rx_ant=p.num_rx_antennas,
            max_num_tx=p.max_num_tx, num_it=p.num_nrx_iter, d_s=p.d_s,
            num_units_init=p.num_units_init,
            num_units_agg=p.num_units_agg,
            num_units_state=p.num_units_state,
            num_units_readout=p.num_units_readout,
            var_mcs_masking=p.mcs_var_mcs_masking,
            initial_chest="ls", mask_pilots=False,
            nrx_dtype=jnp.bfloat16, fused_convs=fused)
        params = rx.init_params(jax.random.PRNGKey(0))
        sc = rx.rg.num_subcarriers

        def fn(y_planar, rx=rx, params=params):
            y = y_planar[..., 0] + 1j * y_planar[..., 1]
            y_in, h_in = rx._prepare_inputs(y)
            llrs, _ = cgnn_apply(params["cgnn"], rx.cgnn_cfg, y_in,
                                 jnp.asarray(rx.pe), h_in,
                                 jnp.ones((1, rx.max_num_tx)),
                                 jnp.ones((1, rx.max_num_tx, 1)),
                                 dtype=jnp.bfloat16)
            return llrs[-1][0]

        y = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 4, 14, sc, 2)), jnp.float32)
        out = np.asarray(jax.jit(fn)(y), np.float32)
        if out_ref is None:
            out_ref = out
        else:
            err = np.abs(out - out_ref).max()
            print(f"max |fused - xla| = {err:.4f} (bf16)", flush=True)
        if args.cpu:
            results[f"fused={fused}"] = None
            continue
        ms = chained_device_time_ms(fn, y, length=args.length, reps=5)
        results[f"fused={fused}"] = round(ms, 4)
        print(f"fused={fused}: {ms:.4f} ms/slot (serialized)", flush=True)

    print(json.dumps({"config": args.config,
                      "slot_device_ms": results}))


if __name__ == "__main__":
    main()
