"""Covariance-based LMMSE channel estimation pipeline tests
(reference baseline 'lmmse' chest: compute_cov -> s-f-t interpolator ->
detection; baseline_rx.py:168-207 + compute_cov_mat.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
class TestLMMSEChest:
    def _params(self, system):
        from neural_rx_tpu.sim.config import Parameters
        p = Parameters("test_small", system=system, training=False,
                       config_dir=TEST_CFG_DIR)
        return p

    def test_cov_matrices_structure(self):
        from neural_rx_tpu.sim.covariance import compute_cov_matrices
        p = self._params("dummy")
        p2 = self._params("baseline_lslin_lmmse")
        cf, ct, cs = compute_cov_matrices(p2, num_batches=2,
                                          batch_size=4)
        assert cf.shape == (48, 48) and ct.shape == (14, 14) \
            and cs.shape == (4, 4)
        # Hermitian PSD with unit-ish diagonal (power-normalized draws)
        for c in (cf, ct, cs):
            np.testing.assert_allclose(c, c.conj().T, atol=1e-5)
            assert np.all(np.real(np.diag(c)) > 0)
        assert abs(np.real(np.trace(cf)) / 48 - 1.0) < 0.3

    def test_lmmse_chest_end_to_end(self, tmp_path):
        from neural_rx_tpu.sim.covariance import compute_cov_matrices
        from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
        p = self._params("baseline_lmmse_lmmse")
        cf, ct, cs = compute_cov_matrices(p, num_batches=2, batch_size=4)
        for name, c in (("freq", cf), ("time", ct), ("space", cs)):
            np.save(tmp_path / f"{p.label}_{name}_cov_mat.npy", c)
        m = BaselineE2EModel(p, "baseline_lmmse_lmmse",
                             cov_dir=str(tmp_path))
        b, b_hat, crc = jax.jit(
            lambda k: m({}, k, 4, jnp.float32(25.0)))(jax.random.PRNGKey(0))
        bler = float(jnp.mean(
            (jnp.sum(jnp.abs(b - b_hat), -1) > 0).astype(jnp.float32)))
        # high SNR with cov-matched LMMSE chest: mostly correct
        assert bler <= 0.4, bler
