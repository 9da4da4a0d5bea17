"""End-to-end path tests: pilotless e2e (custom constellation, masked
DMRS, no initial chest), var-MCS training loss, CFO-impaired training,
AWGN channel path, training-step gradient flow to the constellation."""

import os
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


def make_cfg(name, subs):
    src = open(os.path.join(TEST_CFG_DIR, "test_small.cfg")).read()
    for a, b in subs:
        src = re.sub(a, b, src)
    src = src.replace("label = 'test_small'", f"label = '{name}'")
    path = os.path.join(TEST_CFG_DIR, f"{name}.cfg")
    with open(path, "w") as f:
        f.write(src)
    return name


class TestPilotlessE2E:
    def setup_method(self):
        make_cfg("test_e2e", [
            (r'initial_chest = "ls"', "initial_chest = None"),
            (r"custom_constellation = False",
             "custom_constellation = True"),
            (r"mask_pilots = False", "mask_pilots = True"),
            (r"dmrs_port_sets = \[\[0\], \[2\]\]",
             "dmrs_port_sets = [[0]]"),
            (r"dmrs_nid = \[\[1, 1\], \[1, 1\]\]", "dmrs_nid = [[1, 1]]"),
            (r"n_rntis = \[1, 1\]", "n_rntis = [1]"),
            (r"n_ids = \[1, 1\]", "n_ids = [1]"),
            (r"max_num_tx = 2", "max_num_tx = 1"),
            (r"channel_type = 'UMi'", "channel_type = 'TDL-C300'"),
            (r'channel_type_eval = "DoubleTDLlow"',
             "channel_type_eval = 'TDL-B100'"),
        ])

    def test_training_loss_and_constellation_grad(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_e2e", system="nrx", training=True,
                       config_dir=TEST_CFG_DIR)
        assert p.custom_constellation and p.mask_pilots
        m = E2EModel(p, training=True)
        params = m.init_params(jax.random.PRNGKey(0))
        assert "constellation" in params

        def loss(params, key):
            ld, lc = m(params, key, 4, jnp.float32(4.0),
                       active_dmrs=jnp.ones((4, 1)),
                       mcs_ue_mask=jnp.ones((4, 1, 1)))
            return ld

        g = jax.jit(jax.grad(loss))(params, jax.random.PRNGKey(1))
        gc = np.asarray(g["constellation"][0])
        assert np.isfinite(gc).all()
        assert np.abs(gc).max() > 0  # constellation receives gradient

    def test_pilotless_snr_adjustment(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_e2e", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        m = E2EModel(p, training=False)
        # masked pilots shift Eb/No UP by -10log10(1 - pilots/res)
        # (empty REs not counted as transmitted energy) -> smaller no
        no_masked = float(m._noise_variance(jnp.float32(4.0)))
        p.mask_pilots = False
        m2 = E2EModel(p, training=False)
        no_plain = float(m2._noise_variance(jnp.float32(4.0)))
        assert no_masked < no_plain

    def test_eval_path_runs(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_e2e", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        p.nrx_dtype = jnp.float32
        m = E2EModel(p, training=False)
        params = m.init_params(jax.random.PRNGKey(0))
        b, b_hat, crc = jax.jit(
            lambda pr, k: m(pr, k, 2, jnp.float32(10.0)))(
                params, jax.random.PRNGKey(1))
        assert b.shape == b_hat.shape


class TestCFOTraining:
    def test_cfo_path(self):
        make_cfg("test_cfo", [(r"cfo_offset_ppm = 0.0",
                               "cfo_offset_ppm = 0.2")])
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_cfo", system="nrx", training=True,
                       config_dir=TEST_CFG_DIR)
        assert p.frequency_offset is not None
        m = E2EModel(p, training=True)
        params = m.init_params(jax.random.PRNGKey(0))
        ld, lc = jax.jit(lambda pr, k: m(
            pr, k, 2, jnp.float32(4.0), active_dmrs=jnp.ones((2, 2)),
            mcs_ue_mask=jnp.ones((2, 2, 1))))(params, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld)) and np.isfinite(float(lc))


class TestAWGNChannelPath:
    def test_awgn(self):
        make_cfg("test_awgn", [
            (r"channel_type_eval = \"DoubleTDLlow\"",
             'channel_type_eval = "AWGN"')])
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_awgn", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        p.nrx_dtype = jnp.float32
        m = E2EModel(p, training=False)
        params = m.init_params(jax.random.PRNGKey(0))
        b, b_hat, crc = jax.jit(
            lambda pr, k: m(pr, k, 2, jnp.float32(15.0)))(
                params, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(crc)).all()
