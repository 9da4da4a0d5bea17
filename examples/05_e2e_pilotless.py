"""End-to-end learning: trainable custom constellation + pilotless
communication, with the goodput accounting that rewards zero DMRS
overhead (mirror of the reference e2e notebook)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

SMOKE = "--smoke" in sys.argv

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.e2e import E2EModel
from neural_rx_tpu.sim.metrics import calculate_goodput, \
    export_constellation
from neural_rx_tpu.phy.constellation import Constellation

p = Parameters("e2e_rt", system="nrx", training=True)
p.nrx_dtype = jnp.float32
model = E2EModel(p, training=True)
params = model.init_params(jax.random.PRNGKey(0))
print(f"e2e_rt: custom_constellation={p.custom_constellation}, "
      f"mask_pilots={p.mask_pilots}, initial_chest={p.initial_chest}")
print(f"trainable constellation leaf: "
      f"{params['constellation'][0].shape}")

# one training step: gradients flow into TX constellation + RX weights
def loss(params, key):
    ld, lc = model(params, key, 2, jnp.float32(3.5),
                   active_dmrs=jnp.ones((2, 1)),
                   mcs_ue_mask=jnp.ones((2, 1, 1)))
    return ld
g = jax.jit(jax.grad(loss))(params, jax.random.PRNGKey(1))
print(f"constellation grad norm: "
      f"{float(jnp.linalg.norm(g['constellation'][0])):.4f}")

# goodput: pilotless transmission wins back the DMRS overhead
rg = p.transmitters[0].resource_grid
bler = 0.01
gp_dmrs = calculate_goodput(bler, p.transmitters[0].tb_size,
                            rg.num_resource_elements,
                            rg.num_pilot_symbols, include_pilots=True)
gp_free = calculate_goodput(bler, p.transmitters[0].tb_size,
                            rg.num_resource_elements,
                            rg.num_pilot_symbols, include_pilots=False)
print(f"goodput @BLER 1%: {gp_dmrs:.3f} bit/RE with DMRS budget, "
      f"{gp_free:.3f} bit/RE pilotless (+{100*(gp_free/gp_dmrs-1):.1f}%)")

export_constellation(Constellation.points(
    jnp.asarray(params["constellation"][0])), "/tmp/e2e_constellation.csv")
print("constellation exported to /tmp/e2e_constellation.csv")

if SMOKE:
    # golden outputs (examples/expected_outputs.md)
    assert p.custom_constellation and p.mask_pilots \
        and p.initial_chest is None
    gnorm = float(jnp.linalg.norm(g["constellation"][0]))
    assert gnorm > 1e-4, gnorm  # TX constellation receives gradient
    # pilotless goodput gain == the exact DMRS RE fraction won back
    want = (rg.num_resource_elements
            / (rg.num_resource_elements - rg.num_pilot_symbols))
    assert abs(gp_free / gp_dmrs - want) < 1e-6
    assert os.path.getsize("/tmp/e2e_constellation.csv") > 0
    print("SMOKE PASSED")
