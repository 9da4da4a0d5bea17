"""Statistical and closed-form tests for the channel simulation layer
(TDL Jakes fading, antenna correlation, DoubleTDL, CFO, OFDM application).
Reference parity targets: utils/channel_models.py, utils/impairments.py."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import j0 as bessel_j0  # noqa: F401 (fallback below)

from neural_rx_tpu.channel.tdl import (TDLChannel, exp_correlation_matrix,
                                       TDL_PROFILES, SPEED_OF_LIGHT)
from neural_rx_tpu.channel.double_tdl import DoubleTDLChannel
from neural_rx_tpu.channel.cfo import FrequencyOffset
from neural_rx_tpu.channel.apply import apply_ofdm_channel

FC = 2.14e9
SCS = 30e3


class TestTDL:
    def test_cfr_unit_power(self):
        tdl = TDLChannel("B", 100e-9, FC, max_speed=10.0, num_rx_ant=2,
                         num_tx_ant=1)
        h = tdl(jax.random.PRNGKey(0), 512, 14, 48, SCS)
        assert h.shape == (512, 2, 1, 14, 48)
        p = np.mean(np.abs(np.asarray(h)) ** 2)
        assert abs(p - 1.0) < 0.1

    def test_doppler_autocorrelation(self):
        # constant speed -> E[h(t) h*(t+dt)] = J0(2 pi fd dt) per RE
        speed = 50.0
        fd = speed * FC / SPEED_OF_LIGHT
        tdl = TDLChannel("A", 30e-9, FC, min_speed=speed, max_speed=speed,
                         num_rx_ant=1, num_tx_ant=1)
        h = np.asarray(tdl(jax.random.PRNGKey(1), 512, 14, 4, SCS))
        dt = 1.0 / SCS
        for lag in (1, 4, 8):
            corr = np.mean(h[..., 0, :-lag if lag else None, :]
                           * np.conj(h[..., 0, lag:, :]))
            expected = float(np.real(
                np.sum([np.i0(0)])) * 0 + _j0(2 * np.pi * fd * lag * dt))
            assert abs(corr.real - expected) < 0.05, (lag, corr, expected)

    def test_antenna_correlation(self):
        rx_corr = exp_correlation_matrix(4, 0.9)
        tdl = TDLChannel("B", 100e-9, FC, max_speed=0.0, num_rx_ant=4,
                         num_tx_ant=1, rx_corr=rx_corr)
        h = np.asarray(tdl(jax.random.PRNGKey(2), 2048, 1, 1, SCS))
        x = h[:, :, 0, 0, 0]  # [batch, 4]
        emp = (x.T @ x.conj()) / x.shape[0]
        assert np.allclose(emp, rx_corr, atol=0.08)

    def test_uncorrelated_by_default(self):
        tdl = TDLChannel("C", 300e-9, FC, max_speed=0.0, num_rx_ant=2,
                         num_tx_ant=2)
        h = np.asarray(tdl(jax.random.PRNGKey(3), 4096, 1, 1, SCS))
        x = h.reshape(4096, -1)
        emp = (x.T @ x.conj()) / x.shape[0]
        off = emp - np.diag(np.diag(emp))
        assert np.abs(off).max() < 0.08

    def test_delay_spread_frequency_selectivity(self):
        # larger delay spread -> faster decorrelation across subcarriers
        key = jax.random.PRNGKey(4)
        tdl_s = TDLChannel("B", 30e-9, FC, num_rx_ant=1, num_tx_ant=1)
        tdl_l = TDLChannel("B", 1000e-9, FC, num_rx_ant=1, num_tx_ant=1)
        hs = np.asarray(tdl_s(key, 512, 1, 64, SCS))[:, 0, 0, 0]
        hl = np.asarray(tdl_l(key, 512, 1, 64, SCS))[:, 0, 0, 0]
        def corr(h):
            return abs(np.mean(h[:, :-32] * np.conj(h[:, 32:])))
        assert corr(hs) > 0.9
        assert corr(hl) < 0.5

    def test_rician_k_factor_tdl_d(self):
        tdl = TDLChannel("D", 30e-9, FC, max_speed=0.0, num_rx_ant=1,
                         num_tx_ant=1)
        h = np.asarray(tdl(jax.random.PRNGKey(5), 4096, 1, 1, SCS))
        # first tap dominated by LOS -> |h| concentrated (low variance)
        mag = np.abs(h.ravel())
        assert mag.std() / mag.mean() < 0.5  # Rician, not Rayleigh (~0.52)


def _j0(x):
    try:
        from scipy.special import j0
        return float(j0(x))
    except ImportError:  # series fallback
        return float(np.sum([(-1) ** k * (x / 2) ** (2 * k)
                             / (np.math.factorial(k) ** 2)
                             for k in range(30)]))


class TestDoubleTDL:
    def test_shape_two_users(self):
        ch = DoubleTDLChannel(FC, num_rx_ant=4, num_tx_ant=2,
                              correlation="low")
        h = ch(jax.random.PRNGKey(0), 3, 14, 48, SCS)
        assert h.shape == (3, 4, 2, 2, 14, 48)

    def test_users_independent(self):
        ch = DoubleTDLChannel(FC, 1, 1, correlation="low")
        h = np.asarray(ch(jax.random.PRNGKey(1), 2048, 1, 1, SCS))
        u1 = h[:, 0, 0, 0, 0, 0]
        u2 = h[:, 0, 1, 0, 0, 0]
        c = np.mean(u1 * np.conj(u2))
        assert abs(c) < 0.08


class TestCFO:
    def test_zero_offset_identity(self):
        cfo = FrequencyOffset(0.0)
        x = (jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1, 14, 48))
             + 0j).astype(jnp.complex64)
        y = cfo(jax.random.PRNGKey(1), x)
        assert jnp.allclose(y, x, atol=1e-5)

    def test_constant_offset_phase_ramp(self):
        # offset of exactly one subcarrier spacing shifts each tone by one
        rel = 1.0 / 48  # fo = scs when fft_size = 48 samples/symbol
        cfo = FrequencyOffset(rel, constant_offset=True)
        x = jnp.zeros((1, 1, 1, 1, 48), jnp.complex64).at[..., 10].set(1.0)
        y = np.asarray(cfo(jax.random.PRNGKey(0), x))
        assert abs(y[..., 11]).max() > 0.9  # energy moved to tone 11
        assert abs(y[..., 10]).max() < 0.1


class TestApplyChannel:
    def test_composition(self):
        key = jax.random.PRNGKey(0)
        x = jnp.ones((1, 1, 1, 2, 4), jnp.complex64)
        h = 2.0 * jnp.ones((1, 3, 1, 1, 2, 4), jnp.complex64)
        y = apply_ofdm_channel(key, x, h, 0.0)
        assert y.shape == (1, 3, 2, 4)
        assert np.allclose(np.asarray(y), 2.0)

    def test_noise_variance(self):
        key = jax.random.PRNGKey(1)
        x = jnp.zeros((4, 1, 1, 14, 128), jnp.complex64)
        h = jnp.zeros((4, 2, 1, 1, 14, 128), jnp.complex64)
        y = np.asarray(apply_ofdm_channel(key, x, h, 0.3))
        assert abs(np.mean(np.abs(y) ** 2) - 0.3) < 0.02

    def test_per_batch_noise(self):
        key = jax.random.PRNGKey(2)
        x = jnp.zeros((2, 1, 1, 14, 128), jnp.complex64)
        h = jnp.zeros((2, 1, 1, 1, 14, 128), jnp.complex64)
        no = jnp.asarray([0.1, 1.0])
        y = np.asarray(apply_ofdm_channel(key, x, h, no))
        p = (np.abs(y) ** 2).mean(axis=(1, 2, 3))
        assert abs(p[0] - 0.1) < 0.02 and abs(p[1] - 1.0) < 0.15
