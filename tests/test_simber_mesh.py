"""Distributed Monte-Carlo eval: sim_ber under a ("data","grid") mesh
must produce the same error counters as the unsharded run (XLA SPMD is
a layout change, not a semantics change). Runs the full eval step —
TX, channel, LS, CGNN, LDPC TB decode — on the tiny test config over
the 8-device virtual CPU mesh."""
import os

import jax
import numpy as np

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.e2e import E2EModel
from neural_rx_tpu.sim.simber import sim_ber
from neural_rx_tpu.dist.mesh import make_mesh

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_sim_ber_mesh_matches_single_device():
    p = Parameters("test_small", system="nrx", training=False,
                   config_dir=TEST_CFG_DIR)
    model = E2EModel(p, training=False)
    params = model.init_params(jax.random.PRNGKey(0))

    kw = dict(batch_size=8, max_mc_iter=2, num_target_block_errors=10**9,
              seed=7, verbose=False)
    ber0, bler0 = sim_ber(model, params, [4.0], **kw)

    mesh = make_mesh(8, data=2, grid=4)
    ber1, bler1 = sim_ber(model, params, [4.0], mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(ber1), np.asarray(ber0),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(bler1), np.asarray(bler0),
                               rtol=0, atol=1e-12)
