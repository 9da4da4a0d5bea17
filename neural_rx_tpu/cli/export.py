"""Deployment export CLI (reference scripts/export_onnx.py analog).

AOT-compiles the Aerial-ABI receiver for the requested PRB buckets on
the current backend, measures per-bucket latency, and writes a manifest.
Replaces ONNX -> trtexec: the XLA executable itself is the engine.

Usage: python -m neural_rx_tpu.cli.export --config nrx_rt
       [--buckets 4 132] [--batch 1] [--out onnx_models/]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--buckets", type=int, nargs="*", default=[4, 132])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="deploy_out")
    ap.add_argument("--weights-dir", default="weights")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.rx.neural_rx import NeuralPUSCHReceiver
    from neural_rx_tpu.deploy.aerial import AerialNRX
    from neural_rx_tpu.deploy.aot import measure_latency
    from neural_rx_tpu.sim.training import load_weights

    os.makedirs(args.out, exist_ok=True)
    manifest = {"config": args.config, "batch": args.batch, "buckets": {}}

    for n_prb in args.buckets:
        pr = _assemble(args.config, n_prb)
        rx = NeuralPUSCHReceiver(
            pr.transmitters, num_rx_ant=pr.num_rx_antennas,
            max_num_tx=pr.max_num_tx, num_it=pr.num_nrx_iter_eval,
            d_s=pr.d_s, num_units_init=pr.num_units_init,
            num_units_agg=pr.num_units_agg,
            num_units_state=pr.num_units_state,
            num_units_readout=pr.num_units_readout,
            var_mcs_masking=pr.mcs_var_mcs_masking,
            initial_chest="ls" if pr.initial_chest else None,
            mask_pilots=pr.mask_pilots, nrx_dtype=jnp.bfloat16,
            # inference-only engines: the fused whole-iteration kernel
            # (+ fused init stack) wins the on-chip A/B at BOTH batch
            # regimes (0.850 ms/slot b1, 1021 slots/s b16 —
            # scripts/bench_fused_iter.py, STATUS.md). NRX_FUSED_CONVS /
            # NRX_FUSED_ITER override.
            fused_convs=(
                os.environ["NRX_FUSED_CONVS"] == "1"
                if "NRX_FUSED_CONVS" in os.environ else True),
            fused_iteration=(
                os.environ["NRX_FUSED_ITER"] == "1"
                if "NRX_FUSED_ITER" in os.environ else True))
        wpath = os.path.join(args.weights_dir, f"{pr.label}_weights.pkl")
        if os.path.exists(wpath):
            params = load_weights(wpath)
        else:
            params = rx.init_params(jax.random.PRNGKey(0))

        engine = AerialNRX(rx.rg, rx.cgnn_cfg,
                           num_it=pr.num_nrx_iter_eval)
        sc = rx.rg.num_subcarriers
        t = rx.max_num_tx
        ant = pr.num_rx_antennas
        rng = np.random.default_rng(0)
        inputs = (
            jnp.asarray(rng.normal(size=(args.batch, sc, 14, ant)),
                        jnp.float32),
            jnp.asarray(rng.normal(size=(args.batch, sc, 14, ant)),
                        jnp.float32),
            jnp.asarray(rng.normal(
                size=(args.batch, engine.num_pilots, t, ant)),
                jnp.float32),
            jnp.asarray(rng.normal(
                size=(args.batch, engine.num_pilots, t, ant)),
                jnp.float32),
            jnp.ones((args.batch, t), jnp.float32),
        )
        compiled = jax.jit(engine.__call__).lower(params,
                                                  *inputs).compile()
        stats = measure_latency(compiled, params, inputs)
        # persist the engine itself (TRT .plan analog): weights baked
        # in, loadable without the model-construction code path
        from neural_rx_tpu.deploy.aot import (serialize_engine,
                                              serialize_compiled)
        eng_path = os.path.join(args.out,
                                f"{pr.label}_{n_prb}prb.jaxengine")
        nbytes = serialize_engine(
            lambda *a: engine(params, *a), inputs, eng_path)
        stats["engine_file"] = os.path.basename(eng_path)
        stats["engine_bytes"] = nbytes
        # also persist the COMPILED executable (machine-code level —
        # loading skips XLA compilation entirely; platform-specific)
        try:
            npe_path = os.path.join(args.out,
                                    f"{pr.label}_{n_prb}prb.npe")
            stats["compiled_bytes"] = serialize_compiled(
                compiled, npe_path)
            stats["compiled_file"] = os.path.basename(npe_path)
        except Exception as e:
            stats["compiled_file"] = f"unsupported: {str(e)[:120]}"
        manifest["buckets"][n_prb] = stats
        print(f"bucket {n_prb} PRB: {stats}")

    with open(os.path.join(args.out,
                           f"{args.config}_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print("manifest written")


def _assemble(config_name: str, n_prb: int):
    """Parameters with the eval grid rebuilt at an arbitrary PRB count
    (bucket) by patching n_size_bwp_eval in a temp config copy."""
    import tempfile
    from neural_rx_tpu.sim import config as cfg_mod
    src = open(os.path.join(cfg_mod.CONFIG_DIR,
                            config_name + ".cfg")).read()
    import re
    src = re.sub(r"n_size_bwp_eval = \d+",
                 f"n_size_bwp_eval = {n_prb}", src)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, config_name + ".cfg")
        with open(path, "w") as f:
            f.write(src)
        return cfg_mod.Parameters(config_name, system="nrx",
                                  training=False, config_dir=td)


if __name__ == "__main__":
    main()
