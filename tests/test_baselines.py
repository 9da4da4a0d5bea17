"""Baseline receiver tests: LMMSE equalizer closed-form checks, K-Best
vs exhaustive ML, end-to-end baseline BLER sanity at high SNR.
Reference: utils/baseline_rx.py."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.rx.baselines import lmmse_equalize, kbest_detect
from neural_rx_tpu.phy.constellation import qam_points, bit_labels
from neural_rx_tpu.phy.mapping import demap_maxlog

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


class TestLMMSEEqualizer:
    def test_noiseless_single_stream(self):
        key = jax.random.PRNGKey(0)
        h = (jax.random.normal(key, (100, 4, 1))
             + 1j * jax.random.normal(jax.random.PRNGKey(1), (100, 4, 1))
             ).astype(jnp.complex64)
        x = (jax.random.normal(jax.random.PRNGKey(2), (100, 1))
             + 1j * jax.random.normal(jax.random.PRNGKey(3), (100, 1))
             ).astype(jnp.complex64)
        y = jnp.einsum("bas,bs->ba", h, x)
        x_hat, no_eff = lmmse_equalize(y, h, 1e-6)
        assert np.allclose(np.asarray(x_hat), np.asarray(x), atol=1e-2)
        assert np.all(np.asarray(no_eff) < 1e-4)

    def test_two_streams_separation(self):
        key = jax.random.PRNGKey(4)
        h = (jax.random.normal(key, (512, 4, 2))
             + 1j * jax.random.normal(jax.random.PRNGKey(5), (512, 4, 2))
             ).astype(jnp.complex64) / np.sqrt(2)
        x = (jax.random.normal(jax.random.PRNGKey(6), (512, 2))
             + 1j * jax.random.normal(jax.random.PRNGKey(7), (512, 2))
             ).astype(jnp.complex64) / np.sqrt(2)
        y = jnp.einsum("bas,bs->ba", h, x)
        x_hat, _ = lmmse_equalize(y, h, 1e-5)
        err = np.mean(np.abs(np.asarray(x_hat - x)) ** 2)
        assert err < 1e-2

    def test_unbiased_convention(self):
        # x_hat = x + e: over noise realizations, mean(x_hat) ~ x and
        # var(e) ~ no_eff
        key = jax.random.PRNGKey(8)
        h = (jax.random.normal(key, (1, 4, 2))
             + 1j * jax.random.normal(jax.random.PRNGKey(9), (1, 4, 2))
             ).astype(jnp.complex64)
        h = jnp.tile(h, (4096, 1, 1))
        x = jnp.ones((4096, 2), jnp.complex64) * (0.6 + 0.3j)
        no = 0.1
        n = (jax.random.normal(jax.random.PRNGKey(10), (4096, 4))
             + 1j * jax.random.normal(jax.random.PRNGKey(11), (4096, 4))
             ).astype(jnp.complex64) * np.sqrt(no / 2)
        y = jnp.einsum("bas,bs->ba", h, x) + n
        x_hat, no_eff = lmmse_equalize(y, h, no)
        bias = np.abs(np.asarray(x_hat).mean(0) - np.asarray(x[0]))
        assert np.all(bias < 0.05), bias
        emp_var = np.var(np.asarray(x_hat), axis=0).sum()
        assert abs(emp_var - np.asarray(no_eff)[0].sum()) \
            / np.asarray(no_eff)[0].sum() < 0.35


class TestKBest:
    def _ml_llr(self, y, h, no, m):
        """Exhaustive max-log ML for 2 streams (ground truth)."""
        pts = np.asarray(qam_points(m))
        labels = np.asarray(bit_labels(m))
        P = len(pts)
        cand = np.stack(np.meshgrid(np.arange(P), np.arange(P),
                                    indexing="ij"), -1).reshape(-1, 2)
        x_cand = pts[cand]  # [P*P, 2]
        d = np.abs(y[:, None, :] - np.einsum(
            "bas,cs->bca", h, x_cand)) ** 2
        metric = -d.sum(-1) / no  # [b, P*P]
        llrs = np.zeros((y.shape[0], 2, m))
        for st in range(2):
            bits = labels[cand[:, st]]  # [P*P, m]
            for bit in range(m):
                m1 = np.where(bits[:, bit] > .5, metric, -1e9).max(-1)
                m0 = np.where(bits[:, bit] < .5, metric, -1e9).max(-1)
                llrs[:, st, bit] = m1 - m0
        return llrs

    def test_kbest_matches_ml_16qam(self):
        # K=64 over 16QAM 2 streams keeps 64 of 256 leaves; hard
        # decisions should match ML almost always at moderate SNR
        key = jax.random.PRNGKey(0)
        b, m = 256, 4
        pts = jnp.asarray(qam_points(m))
        h = (jax.random.normal(key, (b, 4, 2)) + 1j * jax.random.normal(
            jax.random.PRNGKey(1), (b, 4, 2))).astype(jnp.complex64) \
            / np.sqrt(2)
        xi = jax.random.randint(jax.random.PRNGKey(2), (b, 2), 0, 16)
        x = pts[xi]
        no = 0.05
        n = (jax.random.normal(jax.random.PRNGKey(3), (b, 4))
             + 1j * jax.random.normal(jax.random.PRNGKey(4), (b, 4))
             ).astype(jnp.complex64) * np.sqrt(no / 2)
        y = jnp.einsum("bas,bs->ba", h, x) + n
        llr_kb = np.asarray(kbest_detect(y, h, no, m, k=64))
        llr_ml = self._ml_llr(np.asarray(y), np.asarray(h), no, m)
        agree = np.mean((llr_kb > 0) == (llr_ml > 0))
        assert agree > 0.98, agree

    def _ml_llr_nstream(self, y, h, no, m, n_streams):
        """Exhaustive max-log ML for any stream count (ground truth)."""
        pts = np.asarray(qam_points(m))
        labels = np.asarray(bit_labels(m))
        P = len(pts)
        grids = np.meshgrid(*([np.arange(P)] * n_streams), indexing="ij")
        cand = np.stack(grids, -1).reshape(-1, n_streams)  # [P^S, S]
        x_cand = pts[cand]
        d = np.abs(y[:, None, :]
                   - np.einsum("bas,cs->bca", h, x_cand)) ** 2
        metric = -d.sum(-1) / no
        llrs = np.zeros((y.shape[0], n_streams, m))
        for st in range(n_streams):
            bits = labels[cand[:, st]]
            for bit in range(m):
                m1 = np.where(bits[:, bit] > .5, metric, -1e9).max(-1)
                m0 = np.where(bits[:, bit] < .5, metric, -1e9).max(-1)
                llrs[:, st, bit] = m1 - m0
        return llrs

    def test_kbest_list_path_full_tree_equals_ml(self):
        """Force the k-survivor LIST path (exact=False) on a full tree:
        3-stream QPSK with k=64 keeps all 4^3=64 leaves, so the list
        recursion must EQUAL exhaustive ML exactly — pinning the
        column-norm detection ordering and its argsort-inverse
        un-permutation (the >2-stream path the exact-ML fast path
        otherwise shadows in every live eval config)."""
        key = jax.random.PRNGKey(20)
        b, m, s = 64, 2, 3
        pts = jnp.asarray(qam_points(m))
        h = (jax.random.normal(key, (b, 4, s)) + 1j * jax.random.normal(
            jax.random.PRNGKey(21), (b, 4, s))).astype(jnp.complex64) \
            / np.sqrt(2)
        xi = jax.random.randint(jax.random.PRNGKey(22), (b, s), 0, 4)
        x = pts[xi]
        no = 0.08
        n = (jax.random.normal(jax.random.PRNGKey(23), (b, 4))
             + 1j * jax.random.normal(jax.random.PRNGKey(24), (b, 4))
             ).astype(jnp.complex64) * np.sqrt(no / 2)
        y = jnp.einsum("bas,bs->ba", h, x) + n
        llr_kb = np.asarray(kbest_detect(y, h, no, m, k=64, exact=False))
        llr_ml = self._ml_llr_nstream(np.asarray(y), np.asarray(h), no,
                                      m, s)
        np.testing.assert_allclose(llr_kb,
                                   np.clip(llr_ml, -20.0, 20.0),
                                   rtol=1e-3, atol=1e-3)

    def test_kbest_exact_flag_forced_list_matches_exact(self):
        """2-stream QPSK, k=16 = full tree: forced list path (the
        detector the exact-ML default replaces) == forced exact path."""
        key = jax.random.PRNGKey(30)
        b, m = 128, 2
        h = (jax.random.normal(key, (b, 4, 2)) + 1j * jax.random.normal(
            jax.random.PRNGKey(31), (b, 4, 2))).astype(jnp.complex64) \
            / np.sqrt(2)
        pts = jnp.asarray(qam_points(m))
        xi = jax.random.randint(jax.random.PRNGKey(32), (b, 2), 0, 4)
        y = jnp.einsum("bas,bs->ba", h, pts[xi])
        no = 0.1
        llr_list = np.asarray(kbest_detect(y, h, no, m, k=16,
                                           exact=False))
        llr_exact = np.asarray(kbest_detect(y, h, no, m, exact=True))
        np.testing.assert_allclose(llr_list, llr_exact, rtol=1e-3,
                                   atol=1e-3)

    def test_kbest_single_stream_equals_demap(self):
        key = jax.random.PRNGKey(5)
        b, m = 128, 4
        h = (jax.random.normal(key, (b, 4, 1)) + 1j * jax.random.normal(
            jax.random.PRNGKey(6), (b, 4, 1))).astype(jnp.complex64)
        pts = jnp.asarray(qam_points(m))
        xi = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, 16)
        x = pts[xi]
        no = 0.1
        y = jnp.einsum("bas,bs->ba", h, x)
        llr = np.asarray(kbest_detect(y, h, no, m, k=16))
        # noiseless: sign of LLR == transmitted bits
        from neural_rx_tpu.phy.constellation import bit_labels
        bits_true = np.asarray(bit_labels(m))[np.asarray(xi[:, 0])]
        assert np.all((llr[:, 0] > 0) == (bits_true > 0.5))


@pytest.mark.slow
class TestBaselineE2E:
    def test_perf_csi_lmmse_high_snr(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
        p = Parameters("test_small", system="baseline_perf_csi_lmmse",
                       training=False, config_dir=TEST_CFG_DIR)
        m = BaselineE2EModel(p, "baseline_perf_csi_lmmse")
        fn = jax.jit(lambda k: m({}, k, 4, jnp.float32(25.0)))
        b, b_hat, crc = fn(jax.random.PRNGKey(0))
        bler = float(jnp.mean(
            (jnp.sum(jnp.abs(b - b_hat), -1) > 0).astype(jnp.float32)))
        assert bler <= 0.3, bler  # DoubleTDL @ 25 dB: mostly correct

    def test_lslin_lmmse_runs(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
        p = Parameters("test_small", system="baseline_lslin_lmmse",
                       training=False, config_dir=TEST_CFG_DIR)
        m = BaselineE2EModel(p, "baseline_lslin_lmmse")
        b, b_hat, crc = jax.jit(
            lambda k: m({}, k, 2, jnp.float32(15.0)))(jax.random.PRNGKey(1))
        assert b.shape == b_hat.shape
        assert np.isfinite(np.asarray(crc)).all()


class TestQRSmall:
    def test_qr_reconstructs_and_orthonormal(self):
        from neural_rx_tpu.rx.baselines import _qr_small
        rng = np.random.default_rng(3)
        h = jnp.asarray(rng.normal(size=(64, 4, 2))
                        + 1j * rng.normal(size=(64, 4, 2)),
                        jnp.complex64)
        q, r = _qr_small(h)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("...as,...sj->...aj", q, r)),
            np.asarray(h), rtol=1e-5, atol=1e-5)
        eye = jnp.einsum("...as,...at->...st", jnp.conj(q), q)
        np.testing.assert_allclose(np.asarray(eye),
                                   np.broadcast_to(np.eye(2), (64, 2, 2)),
                                   rtol=1e-5, atol=1e-5)
        # upper triangular with real positive diagonal
        assert np.allclose(np.asarray(r[:, 1, 0]), 0)
        assert np.all(np.asarray(r[:, 0, 0]).real > 0)

    def test_kbest_equals_linalg_qr_path(self):
        from neural_rx_tpu.rx import baselines
        rng = np.random.default_rng(4)
        h = jnp.asarray(rng.normal(size=(32, 4, 2))
                        + 1j * rng.normal(size=(32, 4, 2)),
                        jnp.complex64)
        y = jnp.asarray(rng.normal(size=(32, 4))
                        + 1j * rng.normal(size=(32, 4)), jnp.complex64)
        llr_mgs = np.asarray(kbest_detect(y, h, 0.1, 4, k=64))
        orig = baselines._qr_small
        try:
            baselines._qr_small = jnp.linalg.qr
            llr_house = np.asarray(kbest_detect(y, h, 0.1, 4, k=64))
        finally:
            baselines._qr_small = orig
        np.testing.assert_allclose(llr_mgs, llr_house, rtol=1e-3,
                                   atol=1e-3)
