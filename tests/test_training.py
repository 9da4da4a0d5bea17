"""Training-loop unit tests (CPU, tiny): chunk step runs and updates
params, checkpoint round-trip, sampling helpers, eval-loss monitor."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neural_rx_tpu.sim.training import (triangular_sample,
                                        sample_mcs_assignment,
                                        make_chunk_step, save_checkpoint,
                                        load_checkpoint, save_weights,
                                        load_weights)

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


class TestSamplers:
    def test_triangular_bias_toward_max(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 400)
        xs = np.asarray([int(triangular_sample(k, 1, 2)) for k in keys])
        assert set(xs) <= {1, 2}
        assert (xs == 2).mean() > 0.6  # triangular biases to more users

    def test_mcs_assignment_uniform(self):
        _, mask = sample_mcs_assignment(jax.random.PRNGKey(1), 64, 2,
                                        [0, 1], 2)
        m = np.asarray(mask)
        assert m.shape == (64, 2, 2)
        assert np.allclose(m.sum(-1), 1.0)
        assert 0.3 < m[..., 0].mean() < 0.7

    def test_mcs_assignment_probs(self):
        num_tx = jnp.int32(2)
        idx, mask = sample_mcs_assignment(
            jax.random.PRNGKey(2), 256, 2, [0, 1], 2, num_tx=num_tx,
            min_num_tx=1, mcs_training_probs=[[0.5, 0.5], [0.9, 0.1]])
        frac0 = float(np.asarray(mask)[..., 0].mean())
        assert frac0 > 0.8  # 2-UE row selects 0.9/0.1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {"a": jnp.arange(4.0), "b": [jnp.ones((2, 2))]}
        opt = optax.adam(1e-3)
        st = opt.init(params)
        path = str(tmp_path / "ck.pkl")
        save_checkpoint(path, params, st, 123)
        p2, st2, step = load_checkpoint(path)
        assert step == 123
        np.testing.assert_array_equal(np.asarray(p2["a"]),
                                      np.arange(4.0))

    def test_weights_roundtrip(self, tmp_path):
        params = {"w": jnp.full((3,), 2.5)}
        path = str(tmp_path / "w.pkl")
        save_weights(path, params)
        p2 = load_weights(path)
        np.testing.assert_array_equal(np.asarray(p2["w"]),
                                      np.asarray(params["w"]))


@pytest.mark.slow
class TestChunkStep:
    def test_params_update_and_loss_finite(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        p = Parameters("test_small", system="nrx", training=True,
                       config_dir=TEST_CFG_DIR)
        # swap UMi for a cheap channel on CPU
        from neural_rx_tpu.channel.double_tdl import DoubleTDLChannel
        p.channel_model = DoubleTDLChannel(p.carrier.carrier_frequency,
                                           num_rx_ant=4, num_tx_ant=2)
        p.channel_type_name = "DoubleTDLlow"
        model = E2EModel(p, training=True)
        params = model.init_params(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        st = opt.init(params)
        step = make_chunk_step(model, p, opt, [0], batch_size=4,
                               double_readout=True, weighting=0.01,
                               apply_multiloss=False, train_tx=False,
                               chunk=2)
        step.set_snr_range(np.asarray([0.0, 1.0]), np.asarray([10., 7.]))
        p2, st2, (ld, lc, loss) = step(params, st, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        # params actually moved
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         params, p2)
        assert max(jax.tree.leaves(d)) > 0
