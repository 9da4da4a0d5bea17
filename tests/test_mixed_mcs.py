"""Mixed-MCS models (reference variable_mcs_nrx.ipynb cells 22-27):
scheduling different MCSs on different UEs and reading back one UE."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_rx_tpu.sim.config import Parameters


def test_mixed_baseline_decodes_clean_at_high_snr():
    """MixedMCSBaselineModel: LS/lin + LMMSE + own-MCS demap decodes
    UE 0 cleanly at high SNR under a mixed-MCS superposition."""
    from neural_rx_tpu.sim.mixed_mcs import MixedMCSBaselineModel

    p = Parameters("nrx_rt_var_mcs", system="nrx", training=False,
                   num_tx_eval=2)
    mask = jnp.asarray([[[1, 0], [0, 1]]], jnp.float32)
    m = MixedMCSBaselineModel(p, [0, 1], ue_return=0, mcs_ue_mask=mask)
    b, bh, ok = m({}, jax.random.PRNGKey(0), 2, 22.0)
    assert b.shape == bh.shape
    assert np.asarray(ok).all(), "CRC must pass at 22 dB"
    assert np.abs(np.asarray(b) - np.asarray(bh)).sum() == 0


def test_mixed_nrx_model_shapes():
    """MixedMCSE2EModel returns UE-0 (bits, bits_hat, crc) triplets with
    the evaluated UE's transport block size."""
    from neural_rx_tpu.sim.mixed_mcs import MixedMCSE2EModel

    p = Parameters("nrx_rt_var_mcs", system="nrx", training=False,
                   num_tx_eval=2)
    mask = jnp.asarray([[[1, 0], [0, 1]]], jnp.float32)
    m = MixedMCSE2EModel(p, [0, 1], ue_return=0, mcs_ue_mask=mask)
    params = m.init_params(jax.random.PRNGKey(0))
    b, bh, ok = m(params, jax.random.PRNGKey(1), 2, 4.0)
    tb0 = m.transmitters[0].tb_size
    assert b.shape == (2, tb0)
    assert bh.shape == (2, tb0)
    assert ok.shape == (2,)
