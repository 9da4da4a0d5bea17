"""Deployment-engine consistency: the Aerial-ABI engine must reproduce
the simulation receiver's LLRs (reference validates TRT engines against
Sionna test vectors the same way, SURVEY.md §4 item 5). Also covers the
weight export/import round-trip."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


class TestEngineConsistency:
    def test_engine_matches_receiver_llrs(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        from neural_rx_tpu.deploy.aerial import AerialNRX
        from neural_rx_tpu.deploy.data_tools import AerialDataGenerator
        from neural_rx_tpu.rx.cgnn import cgnn_apply

        p = Parameters("test_small", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        p.nrx_dtype = jnp.float32
        model = E2EModel(p, training=False)
        params = model.init_params(jax.random.PRNGKey(0))
        rx = model.receiver
        engine = AerialNRX(rx.rg, rx.cgnn_cfg, dtype=jnp.float32)
        gen = AerialDataGenerator(model, engine)
        inputs, labels = gen(jax.random.PRNGKey(1), 2, 10.0)

        llr_engine, h_engine = engine(params, *inputs)
        # [b,T,sc,sym,ch]: LLRs sign-flipped, h_hat as-is
        llr_engine = -jnp.transpose(llr_engine, (0, 1, 3, 2, 4))
        h_engine = jnp.transpose(h_engine, (0, 1, 3, 2, 4))

        # simulation path on the same received slot
        y = (inputs[0] + 1j * inputs[1])  # [b, sc, sym, ant]
        y = jnp.transpose(y, (0, 3, 2, 1))  # [b, ant, sym, sc]
        y_in, h_in = rx._prepare_inputs(y)
        llrs, h_hats = cgnn_apply(params["cgnn"], rx.cgnn_cfg, y_in,
                                  jnp.asarray(rx.pe), h_in,
                                  jnp.ones((2, rx.max_num_tx)),
                                  jnp.ones((2, rx.max_num_tx, 1)),
                                  dtype=jnp.float32)
        llr_sim = llrs[-1][0]
        # engine's FOCC+NN preprocessing == simulation LS+FOCC+NN, so
        # the LLR grids must agree closely
        np.testing.assert_allclose(np.asarray(llr_engine),
                                   np.asarray(llr_sim), rtol=1e-3,
                                   atol=1e-3)
        # and the engine's second output is the chest readout, matching
        # the simulation path's refined h_hat (reference engine
        # contract: (llr, h_hat), neural_rx.py:1796-1812)
        np.testing.assert_allclose(np.asarray(h_engine),
                                   np.asarray(h_hats[-1]), rtol=1e-3,
                                   atol=1e-3)


class TestWeightExportRoundtrip:
    def test_roundtrip(self):
        from neural_rx_tpu.rx.cgnn import CGNNConfig, init_cgnn_params
        from neural_rx_tpu.compat.reference_weights import (
            export_reference_weights, import_reference_weights)
        cfg = CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4,
                         num_it=2, d_s=56, num_units_init=(128, 128),
                         num_units_agg=((64,), (64,)),
                         num_units_state=((128, 128), (128, 128)),
                         num_units_readout=(128,), initial_chest=True)
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        wl = export_reference_weights({"cgnn": params})
        assert len(wl) == 43  # nrx_rt layout
        back = import_reference_weights(params, wl)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
