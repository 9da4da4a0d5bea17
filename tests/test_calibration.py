"""End-to-end SNR-calibration regression tests.

These encode the calibration debugging of 2026-08-17: the framework's
BLER curves must sit where the reference's committed curves sit
(BASELINE.md). Genie-CSI single-user MRC over TDL is the near-analytic
anchor: BLER ~5e-2 at Eb/No 1 dB, ~0 at 3 dB (reference
Perf-CSI+K-Best 1 UE: 5.3e-2 @ 1 dB, 4.4e-3 @ 2 dB). A systematic
SNR-accounting bug (e.g. non-unit-norm precoding) shifts this by ~3 dB
and fails the test.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
from neural_rx_tpu.channel.tdl import TDLChannel

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
class TestSNRCalibration:
    def test_perf_csi_1ue_anchor(self):
        # 4-PRB variant of the anchor (cheap): genie CSI, 1 UE, TDL-B.
        # Smaller TB (less freq diversity) -> waterfall a bit later than
        # at 132 PRB; at 3 dB BLER must be well below 0.2, at -1 dB
        # well above 0.5 (with the old miscalibration, 3 dB gave ~0.9).
        p = Parameters("test_small", system="baseline_perf_csi_lmmse",
                       training=False, num_tx_eval=1,
                       config_dir=TEST_CFG_DIR)
        p.channel_model = TDLChannel(
            "B", 100e-9, p.carrier.carrier_frequency, min_speed=56.0,
            max_speed=56.0, num_rx_ant=4, num_tx_ant=2)
        p.channel_type_name = "TDL-B100"
        m = BaselineE2EModel(p, "baseline_perf_csi_lmmse")
        fn = jax.jit(lambda k, e: m({}, k, 16, e))

        def bler(ebno, iters=4):
            errs = blocks = 0
            key = jax.random.PRNGKey(int(ebno * 17) + 3)
            for _ in range(iters):
                key, sub = jax.random.split(key)
                b, b_hat, _ = fn(sub, jnp.float32(ebno))
                e = np.asarray(jnp.sum(jnp.abs(b - b_hat), -1) > 0)
                errs += e.sum()
                blocks += e.size
            return errs / blocks

        assert bler(3.0) < 0.2
        assert bler(-2.0) > 0.5

    def test_unit_norm_precoding(self):
        p = Parameters("test_small", system="dummy", training=False,
                       config_dir=TEST_CFG_DIR)
        from neural_rx_tpu.phy.nr.dmrs import DMRSConfig
        from neural_rx_tpu.phy.nr.pusch import CarrierConfig, PUSCHConfig
        cfg = PUSCHConfig(CarrierConfig(), DMRSConfig(), tpmi=2)
        for tpmi in range(6):
            w = cfg.clone(tpmi=tpmi).precoding_matrix()
            assert np.isclose(np.linalg.norm(w), 1.0, atol=1e-6)
