"""CGNN architecture anatomy: components, parameter counts, and the
accuracy/latency trade of iteration-depth truncation
(mirror of the reference nrx_architecture notebook)."""
import sys, os, time, argparse
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
SMOKE = "--smoke" in sys.argv

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                   cgnn_apply, count_params)

cfg = CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=8,
                 d_s=56, num_units_init=(128, 128),
                 num_units_agg=((64,),) * 8,
                 num_units_state=((128, 128),) * 8,
                 num_units_readout=(128,))
params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
print(f"nrx_large (8 iterations): {count_params(params):,} params")
print("per-component:")
print(f"  state init : {count_params(params['s_init']):,}")
print(f"  1 iteration: {count_params(params['iterations'][0]):,}")
print(f"  readouts   : "
      f"{count_params(params['readout_llrs']) + count_params(params['readout_chest']):,}")

# depth truncation: the num_it property lets a trained 8-iteration
# network run at any depth 1..8 (latency/BLER trade, BASELINE.md)
if SMOKE:
    # golden outputs (examples/expected_outputs.md): exact component
    # parameter counts of the 8-iteration nrx_large architecture
    assert count_params(params) == 437366, count_params(params)
    assert count_params(params["s_init"]) == 28634
    assert count_params(params["iterations"][0]) == 49074
    assert (count_params(params["readout_llrs"])
            + count_params(params["readout_chest"])) == 16140

y = jax.random.normal(jax.random.PRNGKey(1), (1, 14, 48, 8))
pe = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 48, 2))
h = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 14, 48, 8))
outs = {}
for num_it in (1, 2, 4, 8):
    f = jax.jit(lambda p_, y_, h_: cgnn_apply(
        p_, cfg, y_, pe, h_, jnp.ones((1, 2)), jnp.ones((1, 2, 1)),
        num_it=num_it)[0][-1][0])
    np.asarray(f(params, y, h))  # host sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(params, y, h)
    outs[num_it] = np.asarray(out)
    print(f"num_it={num_it}: {(time.perf_counter()-t0)/5*1e3:.2f} ms "
          f"(CPU, 4 PRB demo)")

if SMOKE:
    # depth truncation really truncates: different depths, different LLRs
    assert not np.allclose(outs[1], outs[8])
    assert not np.allclose(outs[2], outs[4])
    print("SMOKE PASSED")
