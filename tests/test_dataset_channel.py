"""Dataset channel + native CIR reader tests (reference
utils/channel_models.py:163-321 semantics)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from neural_rx_tpu.channel.io_native import write_cirbin, read_cirbin, \
    _read_cirbin_np
from neural_rx_tpu.channel.dataset import DatasetChannel, load_cir_records


def make_dataset(tmp_path, n=40, r=4, x=2, p=6):
    rng = np.random.default_rng(0)
    a = (rng.normal(size=(n, r, x, p))
         + 1j * rng.normal(size=(n, r, x, p))).astype(np.complex64)
    tau = np.sort(rng.uniform(0, 1e-6, size=(n, p))).astype(np.float32)
    path = os.path.join(tmp_path, "test.cirbin")
    write_cirbin(path, a, tau)
    return path, a, tau


class TestNativeReader:
    def test_roundtrip(self, tmp_path):
        path, a, tau = make_dataset(str(tmp_path))
        a2, tau2 = read_cirbin(path)
        np.testing.assert_array_equal(a, a2)
        np.testing.assert_array_equal(tau, tau2)

    def test_numpy_fallback_matches(self, tmp_path):
        path, a, tau = make_dataset(str(tmp_path))
        a3, tau3 = _read_cirbin_np(path)
        np.testing.assert_array_equal(a, a3)
        np.testing.assert_array_equal(tau, tau3)


class TestDatasetChannel:
    def test_training_draw_shapes(self, tmp_path):
        path, a, tau = make_dataset(str(tmp_path))
        ch = DatasetChannel(path, training=True, num_tx=2)
        h = ch(jax.random.PRNGKey(0), 3, 2, 14, 48, 30e3)
        assert h.shape == (3, 4, 2, 2, 14, 48)
        assert np.isfinite(np.asarray(np.abs(h))).all()

    def test_partitions_disjoint(self, tmp_path):
        path, a, tau = make_dataset(str(tmp_path))
        ch = DatasetChannel(path, training=True, num_tx=2)
        assert not set(ch.partitions[0]) & set(ch.partitions[1])

    def test_cfr_matches_manual(self, tmp_path):
        path, a, tau = make_dataset(str(tmp_path), n=4)
        ch = DatasetChannel(path, training=False, num_tx=1,
                            random_subsampling=False)
        scs = 30e3
        h = np.asarray(np.abs(ch(jax.random.PRNGKey(1), 1, 1, 1, 8, scs)))
        h_sel = h[0, :, 0, :, 0, :]  # [rx_ant, tx_ant, sc]
        # manual check against definition for some record
        f = (np.arange(8) - 3.5) * scs
        found = False
        for rec in range(4):
            manual = np.abs((a[rec, :, :, :, None]
                             * np.exp(-2j * np.pi * f[None, None, None, :]
                                      * tau[rec][:, None])).sum(2))
            if np.allclose(manual, h_sel, atol=1e-3):
                found = True
                break
        assert found
