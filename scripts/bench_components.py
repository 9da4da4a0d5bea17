"""Component-level latency breakdown of the deployed nrx_rt surface:
LS chest + input prep vs CGNN (init / iterations / readouts), serialized
device time each, to target the next kernel (NOTES item: attack the
largest non-CGNN block).

Usage: python scripts/bench_components.py [--length 100]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import dataclasses
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
    cfg = dataclasses.replace(rx.cgnn_cfg, fused_convs=True,
                              fused_iteration=True)

    y1 = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 14, sc, 2)), jnp.float32)

    def prep(y_planar):
        y = y_planar[..., 0] + 1j * y_planar[..., 1]
        y_in, h_in = rx._prepare_inputs(y)
        # return something small but dependent on both
        return y_in, h_in

    def full(y_planar):
        y_in, h_in = prep(y_planar)
        llrs, _ = cgnn_apply(params["cgnn"], cfg, y_in,
                             jnp.asarray(rx.pe), h_in,
                             jnp.ones((1, rx.max_num_tx)),
                             jnp.ones((1, rx.max_num_tx, 1)),
                             dtype=jnp.bfloat16)
        return llrs[-1][0]

    # CGNN alone: feed precomputed (y_in, h_in); chain on y_in
    y_in0, h_in0 = jax.jit(prep)(y1)

    def cgnn_only(y_in):
        llrs, _ = cgnn_apply(params["cgnn"], cfg, y_in,
                             jnp.asarray(rx.pe), h_in0,
                             jnp.ones((1, rx.max_num_tx)),
                             jnp.ones((1, rx.max_num_tx, 1)),
                             dtype=jnp.bfloat16)
        return llrs[-1][0]

    res = {}
    for name, fn, arg in (("full", full, y1),
                          ("prep_only", lambda y: prep(y)[1], y1),
                          ("cgnn_only", cgnn_only, y_in0)):
        ms = chained_device_time_ms(fn, arg, length=args.length, reps=5)
        res[name] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms", flush=True)
    res["prep_derived"] = round(res["full"] - res["cgnn_only"], 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
