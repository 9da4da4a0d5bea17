"""Jumpstart: build the nrx_rt system and run a small BLER evaluation.

Mirror of the reference's jumpstart notebook. Runs on CPU by default
(pass --tpu to use the accelerator).
"""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.e2e import E2EModel
from neural_rx_tpu.sim.simber import sim_ber
from neural_rx_tpu.rx.cgnn import count_params

# 4-PRB training-grid system (fast); eval config uses 132 PRBs
p = Parameters("nrx_rt", system="nrx", training=True)
model = E2EModel(p, training=False)
params = model.init_params(jax.random.PRNGKey(0))
print(f"config: {p.label}, {p.n_size_bwp} PRBs, "
      f"{len(p.mcs_index)} MCS, {p.max_num_tx} UEs")
print(f"CGNN parameters: {count_params(params['cgnn']):,}")

ber, bler = sim_ber(model, params, [0.0, 4.0], batch_size=8,
                    max_mc_iter=2, num_target_block_errors=10)
print("(untrained weights — load weights/nrx_rt_weights.pkl or import "
      "reference weights via neural_rx_tpu.compat for real curves)")

if args.smoke:
    # golden outputs (examples/expected_outputs.md): exact architecture
    # parity + the trained-vs-untrained BER gap on the 4-PRB demo grid
    import numpy as np
    from neural_rx_tpu.sim.training import load_weights
    assert count_params(params["cgnn"]) == 142922, \
        count_params(params["cgnn"])
    assert float(np.asarray(bler)[0]) > 0.9  # untrained = chance
    trained = load_weights(os.path.join(
        os.path.dirname(__file__), "..", "weights",
        "nrx_rt_weights.pkl"))
    ber_t, _ = sim_ber(model, trained, [4.0], batch_size=8,
                       max_mc_iter=2, num_target_block_errors=10)
    b_u, b_t = float(np.asarray(ber)[1]), float(np.asarray(ber_t)[0])
    print(f"BER @4 dB: untrained {b_u:.3f}, trained {b_t:.3f}")
    assert b_u > 0.45, b_u          # untrained: coin flips
    assert b_t < b_u - 0.08, (b_t, b_u)  # trained: clearly better
    print("SMOKE PASSED")
