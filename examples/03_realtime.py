"""Real-time deployment: Aerial-ABI engine, AOT compilation, latency
measurement, and engine-vs-simulation consistency
(mirror of the reference real_time_nrx notebook; trtexec role is
played by XLA AOT compilation)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--tpu", action="store_true")
ap.add_argument("--smoke", action="store_true",
                help="assert the committed golden outputs "
                     "(examples/expected_outputs.md)")
args = ap.parse_args()

import jax
if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.e2e import E2EModel
from neural_rx_tpu.deploy.aerial import AerialNRX
from neural_rx_tpu.deploy.aot import measure_latency
from neural_rx_tpu.deploy.data_tools import (AerialDataGenerator,
                                             AerialDataEvaluator)

p = Parameters("nrx_rt", system="nrx", training=True)  # 4-PRB demo grid
p.nrx_dtype = jnp.float32
model = E2EModel(p, training=False)
params = model.init_params(jax.random.PRNGKey(0))
engine = AerialNRX(model.receiver.rg, model.receiver.cgnn_cfg,
                   dtype=jnp.float32)

gen = AerialDataGenerator(model, engine)
inputs, labels = gen(jax.random.PRNGKey(1), 1, 20.0)
compiled = jax.jit(engine.__call__).lower(params, *inputs).compile()
stats = measure_latency(compiled, params, inputs, iters=20)
print("engine latency:", stats)

ev = AerialDataEvaluator(model)
# the engine returns (llr, h_hat) like the reference's exported engine
# (neural_rx.py:1796-1812); the evaluator consumes the LLR half
out = ev(compiled(params, *inputs)[0], labels)
print("engine output metrics (untrained weights):", out)

if args.smoke:
    # golden outputs (examples/expected_outputs.md): the deployed
    # Aerial-ABI engine with the committed trained weights decodes
    # cleanly at high SNR — an engine-vs-simulation acceptance check
    from neural_rx_tpu.sim.training import load_weights
    trained = load_weights(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "weights",
        "nrx_rt_weights.pkl"))
    bers, crcs = [], []
    for s in range(4):  # the engine is compiled for batch 1
        ins, labs = gen(jax.random.PRNGKey(10 + s), 1, 20.0)
        m = ev(compiled(trained, *ins)[0], labs)
        bers.append(m["coded_ber"])
        crcs.append(m["crc_pass_rate"])
    out_t = {"coded_ber": float(np.mean(bers)),
             "crc_pass_rate": float(np.mean(crcs))}
    print("engine output metrics (trained weights, 20 dB):", out_t)
    # the 4-PRB 2-UE demo grid is hard (short code blocks, little
    # frequency diversity): golden band is trained ~0.20 coded BER /
    # ~0.4 CRC pass vs untrained ~0.5 / 0.0 (see expected_outputs.md)
    assert out_t["coded_ber"] < 0.30, out_t
    assert out_t["crc_pass_rate"] >= 0.25, out_t
    assert out["crc_pass_rate"] == 0.0, out  # untrained: nothing passes
    assert out_t["coded_ber"] < out["coded_ber"] - 0.15, (out, out_t)
    assert stats["p50_ms"] > 0
    print("SMOKE PASSED")
