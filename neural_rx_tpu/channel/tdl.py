"""3GPP TR 38.901 §7.7.2 TDL channel models (frequency-domain, jnp).

TPU-native replacement for Sionna's TDL + GenerateOFDMChannel as used by
the reference (`utils/parameters.py:356-393`, `utils/channel_models.py`).

Design: the CFR for a whole slot is generated directly in the frequency
domain — per-tap Rayleigh processes with Jakes Doppler spectrum (sum of
sinusoids) evolved across OFDM symbols, spatially correlated via matrix
square roots of the antenna correlation matrices, then projected onto the
subcarrier grid with a static [num_taps, num_sc] phase matrix (one small
matmul on the MXU). Everything is jittable with static shapes.

Tap tables are the normalized delay/power profiles of TR 38.901 Tables
7.7.2-1..5. Powers are normalized to unit total power (Sionna does the
same). UE speed is sampled uniformly in [min_speed, max_speed] per batch
sample (Sionna TDL semantics — the reference passes max_speed only, so
speeds are sampled in [0, max]).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SPEED_OF_LIGHT = 299792458.0

# TR 38.901 Table 7.7.2-1..5: (normalized delays, powers [dB])
TDL_PROFILES = {
    "A": (
        [0.0000, 0.3819, 0.4025, 0.5868, 0.4610, 0.5375, 0.6708, 0.5750,
         0.7618, 1.5375, 1.8978, 2.2242, 2.1718, 2.4942, 2.5119, 3.0582,
         4.0810, 4.4579, 4.5695, 4.7966, 5.0066, 5.3043, 9.6586],
        [-13.4, 0.0, -2.2, -4.0, -6.0, -8.2, -9.9, -10.5, -7.5, -15.9,
         -6.6, -16.7, -12.4, -15.2, -10.8, -11.3, -12.7, -16.2, -18.3,
         -18.9, -16.6, -19.9, -29.7],
    ),
    "B": (
        [0.0000, 0.1072, 0.2155, 0.2095, 0.2870, 0.2986, 0.3752, 0.5055,
         0.3681, 0.3697, 0.5700, 0.5283, 1.1021, 1.2756, 1.5474, 1.7842,
         2.0169, 2.8294, 3.0219, 3.6187, 4.1067, 4.2790, 4.7834],
        [0.0, -2.2, -4.0, -3.2, -9.8, -1.2, -3.4, -5.2, -7.6, -3.0, -8.9,
         -9.0, -4.8, -5.7, -7.5, -1.9, -7.6, -12.2, -9.8, -11.4, -14.9,
         -9.2, -11.3],
    ),
    "C": (
        [0.0000, 0.2099, 0.2219, 0.2329, 0.2176, 0.6366, 0.6448, 0.6560,
         0.6584, 0.7935, 0.8213, 0.9336, 1.2285, 1.3083, 2.1704, 2.7105,
         4.2589, 4.6003, 5.4902, 5.6077, 6.3065, 6.6374, 7.0427, 8.6523],
        [-4.4, -1.2, -3.5, -5.2, -2.5, 0.0, -2.2, -3.9, -7.4, -7.1, -10.7,
         -11.1, -5.1, -6.8, -8.7, -13.2, -13.9, -13.9, -15.8, -17.1, -16.0,
         -15.7, -21.6, -22.8],
    ),
    # D/E: NLOS taps only would need a LOS component; the first tap of the
    # table is a pure LOS ray with the given K-factor. Rician handling below.
    "D": (
        [0.0, 0.035, 0.612, 1.363, 1.405, 1.804, 2.596, 1.775, 4.042,
         7.937, 9.424, 9.708, 12.525],
        [-0.2, -13.5, -18.8, -21.0, -22.8, -17.9, -20.1, -21.9, -22.9,
         -27.8, -23.6, -24.8, -30.0],
    ),
    "E": (
        [0.0, 0.5133, 0.5440, 0.5630, 0.5440, 0.7112, 1.9092, 1.9293,
         1.9589, 2.6426, 3.7136, 5.4524, 12.0034, 20.6519],
        [-0.03, -22.03, -15.8, -18.1, -19.8, -22.9, -22.4, -18.6, -20.8,
         -22.6, -20.3, -24.6, -20.7, -32.4],
    ),
}
# LOS first-tap Rician K-factors [dB] for D/E
TDL_LOS_K = {"D": 13.3, "E": 22.0}
_NUM_SINUSOIDS = 32


def _corr_sqrt(mat: np.ndarray) -> np.ndarray:
    """Hermitian PSD matrix square root (eigh-based, NumPy, config time)."""
    w, v = np.linalg.eigh(mat)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)[None, :]) @ v.conj().T


def exp_correlation_matrix(num_ant: int, a: float) -> np.ndarray:
    """38.901 exponential correlation (reference channel_models.py:20-37):
    Toeplitz with first row a**exponents (exponents spaced quadratically
    for 4/8 antennas)."""
    assert num_ant in (1, 2, 4, 8)
    exponents = {
        1: [0.0], 2: [0.0, 1.0], 4: [0.0, 1 / 9, 4 / 9, 1.0],
        8: [0.0, 1 / 49, 4 / 49, 9 / 49, 16 / 49, 25 / 49, 36 / 49, 1.0],
    }[num_ant]
    row = np.power(float(a), exponents).astype(np.complex128)
    n = num_ant
    mat = np.empty((n, n), np.complex128)
    for i in range(n):
        for j in range(n):
            mat[i, j] = row[abs(i - j)] if j >= i else np.conj(
                row[abs(i - j)])
    return mat


class TDLChannel:
    """One TDL link (one UE): generates CFRs for a 14-symbol slot.

    Parameters mirror the reference's TDL construction
    (channel_models.py:110-137): model letter, delay spread, carrier
    frequency, max speed, antenna counts, optional correlation matrices.
    """

    def __init__(self, model: str, delay_spread: float,
                 carrier_frequency: float, min_speed: float = 0.0,
                 max_speed: float | None = None, num_rx_ant: int = 4,
                 num_tx_ant: int = 2, rx_corr: np.ndarray | None = None,
                 tx_corr: np.ndarray | None = None,
                 normalize: bool = False):
        delays_n, powers_db = TDL_PROFILES[model]
        self.model = model
        self.delays = np.asarray(delays_n, np.float64) * delay_spread
        p = 10.0 ** (np.asarray(powers_db, np.float64) / 10.0)
        self.powers = (p / p.sum()).astype(np.float32)
        self.k_factor_db = TDL_LOS_K.get(model)
        self.num_taps = len(self.delays)
        self.carrier_frequency = carrier_frequency
        self.min_speed = float(min_speed)
        self.max_speed = float(max_speed if max_speed is not None
                               else min_speed)
        self.num_rx_ant = num_rx_ant
        self.num_tx_ant = num_tx_ant
        self.normalize = normalize
        self._rx_sqrt = (_corr_sqrt(rx_corr).astype(np.complex64)
                         if rx_corr is not None else None)
        self._tx_sqrt = (_corr_sqrt(tx_corr).astype(np.complex64)
                         if tx_corr is not None else None)

    def phase_matrix(self, num_sc: int, subcarrier_spacing: float
                     ) -> np.ndarray:
        """Static [num_taps, num_sc] tap->subcarrier projection
        exp(-j 2 pi f_k tau_l) with centered subcarrier frequencies."""
        f = (np.arange(num_sc) - (num_sc - 1) / 2.0) * subcarrier_spacing
        return np.exp(-2j * np.pi * f[None, :] * self.delays[:, None]
                      ).astype(np.complex64)

    def __call__(self, key: jax.Array, batch_size: int, num_symbols: int,
                 num_sc: int, subcarrier_spacing: float,
                 symbol_duration: float | None = None) -> jnp.ndarray:
        """CFRs h: [batch, num_rx_ant, num_tx_ant, num_symbols, num_sc]."""
        if symbol_duration is None:
            symbol_duration = 1.0 / subcarrier_spacing
        k_speed, k_alpha, k_phi, k_los = jax.random.split(key, 4)
        nt, nr, ntx = self.num_taps, self.num_rx_ant, self.num_tx_ant
        ns = _NUM_SINUSOIDS

        speed = jax.random.uniform(
            k_speed, (batch_size,), minval=self.min_speed,
            maxval=max(self.max_speed, self.min_speed + 1e-9))
        fd = speed * self.carrier_frequency / SPEED_OF_LIGHT  # [b]

        # Jakes sum-of-sinusoids per (tap, rx, tx, sinusoid)
        shape = (batch_size, nr, ntx, nt, ns)
        alpha = jax.random.uniform(k_alpha, shape, minval=-np.pi,
                                   maxval=np.pi)
        phi = jax.random.uniform(k_phi, shape, minval=-np.pi, maxval=np.pi)
        t = (jnp.arange(num_symbols, dtype=jnp.float32)
             * symbol_duration)  # [sym]
        # theta[b, r, x, l, n, sym]
        doppler = (2.0 * jnp.pi * fd[:, None, None, None, None]
                   * jnp.cos(alpha))
        theta = (doppler[..., None] * t[None, None, None, None, None, :]
                 + phi[..., None])
        # g = (1/sqrt(ns)) * sum_n exp(j theta_n): unit-power Rayleigh taps
        # with Jakes autocorrelation J0(2 pi fd dt). g: [b, r, x, l, sym]
        g = jnp.sum(jnp.exp(1j * theta.astype(jnp.complex64)), axis=-2) \
            / np.sqrt(ns)

        # Rician LOS on the first tap for D/E (K-factor per 38.901)
        if self.k_factor_db is not None:
            k_lin = 10.0 ** (self.k_factor_db / 10.0)
            los_phase = jax.random.uniform(
                k_los, (batch_size,), minval=-np.pi, maxval=np.pi)
            # deterministic LOS ray, AoA = 0 -> Doppler shift fd
            los = jnp.exp(1j * (los_phase[:, None]
                                + 2.0 * jnp.pi * fd[:, None] * t[None, :]
                                ).astype(jnp.complex64))  # [b, sym]
            g0 = (np.sqrt(k_lin / (k_lin + 1)) * los[:, None, None, :]
                  + np.sqrt(1.0 / (k_lin + 1)) * g[:, :, :, 0, :])
            g = g.at[:, :, :, 0, :].set(g0)

        # Spatial correlation: R_rx^(1/2) G R_tx^(T/2)
        if self._rx_sqrt is not None:
            g = jnp.einsum("ij,bjxls->bixls", jnp.asarray(self._rx_sqrt), g)
        if self._tx_sqrt is not None:
            g = jnp.einsum("kx,bjxls->bjkls", jnp.asarray(self._tx_sqrt), g)

        # Scale taps by sqrt(power), project onto subcarriers
        amp = jnp.sqrt(jnp.asarray(self.powers))  # [l]
        g = g * amp[None, None, None, :, None]
        pm = jnp.asarray(self.phase_matrix(num_sc, subcarrier_spacing))
        h = jnp.einsum("brxls,lc->brxsc", g, pm)
        if self.normalize:
            mean_pow = jnp.mean(jnp.abs(h) ** 2, axis=(1, 2, 3, 4),
                                keepdims=True)
            h = h / jnp.sqrt(mean_pow).astype(h.dtype)
        return h
