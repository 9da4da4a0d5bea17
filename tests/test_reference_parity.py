"""Golden-vector parity vs the reference's committed artifacts
(SURVEY.md §4 'implication' item): the reference-trained nrx_rt weights,
run through this framework's full first-party chain, must achieve the
coded-bit error rate consistent with the reference's committed BLER
curve. CPU version at reduced scale; the full TPU BLER parity is
scripts/parity_check.py (measured 2026-08-17: ours 0.203 vs reference
0.325 BLER @ 2 dB)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF_WEIGHTS = "/root/reference/weights/nrx_rt_weights"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_WEIGHTS),
                    reason="reference weights not mounted")
class TestReferenceParity:
    def test_coded_ber_at_4db(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel, tb_encode_batch
        from neural_rx_tpu.rx.cgnn import cgnn_apply
        from neural_rx_tpu.compat.reference_weights import \
            load_reference_weights
        from neural_rx_tpu.phy.misc import binary_source

        p = Parameters("nrx_rt", system="nrx", training=False)
        p.nrx_dtype = jnp.float32
        model = E2EModel(p, training=False)
        rx = model.receiver
        params = load_reference_weights(
            REF_WEIGHTS, model.init_params(jax.random.PRNGKey(0)))

        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        BATCH = 4
        bits = binary_source(keys[1], (BATCH, 2,
                                       p.transmitters[0].tb_size))
        x = p.transmitters[0](bits)
        no = model._noise_variance(jnp.float32(4.0))
        y, h = model._channel(keys[4], BATCH, x, no)
        y_in, h_in = rx._prepare_inputs(y)
        llrs, _ = cgnn_apply(params["cgnn"], rx.cgnn_cfg, y_in,
                             jnp.asarray(rx.pe), h_in,
                             jnp.ones((BATCH, 2)),
                             jnp.ones((BATCH, 2, 1)), dtype=jnp.float32)
        llr_data = rx.rg.demap_data(llrs[-1][0]).reshape(BATCH, 2, -1)
        labels = tb_encode_batch(p.transmitters[0], bits)
        ber = float(jnp.mean(((llr_data > 0) != (labels > 0.5))))
        # measured 0.0536 with this seed set at 4 dB (reference-curve
        # consistent); the broken-convention regressions produced >= 0.10
        assert ber < 0.075, ber
