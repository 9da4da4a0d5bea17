"""Real-time deployment: Aerial-ABI engine, AOT compilation, latency
measurement, and engine-vs-simulation consistency
(mirror of the reference real_time_nrx notebook; trtexec role is
played by XLA AOT compilation)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--tpu", action="store_true")
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
out = ev(compiled(params, *inputs), labels)
print("engine output metrics (untrained weights):", out)
