"""DoubleTDL evaluation channel: TDL-B100-400 (UE 1) + TDL-C300-100 (UE 2).

Behavioral parity with the reference's `DoubleTDLChannel`
(`utils/channel_models.py:39-161`): two independent TDL links with
antenna correlation low/medium/high (alpha/beta = 0/0, 0.9/0.3, 0.9/0.9),
concatenated along the tx (user) axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tdl import TDLChannel, exp_correlation_matrix, SPEED_OF_LIGHT

_CORR = {"low": (0.0, 0.0), "medium": (0.9, 0.3), "high": (0.9, 0.9)}


class DoubleTDLChannel:
    """Two-UE benchmark channel (exactly 2 users)."""

    def __init__(self, carrier_frequency: float, num_rx_ant: int = 4,
                 num_tx_ant: int = 2, norm_channel: bool = False,
                 correlation: str = "low"):
        alpha, beta = _CORR[correlation]
        rx_corr = exp_correlation_matrix(num_rx_ant, alpha)
        tx_corr = exp_correlation_matrix(num_tx_ant, beta)

        # UE 1: TDL-B, 100 ns delay spread, 400 Hz Doppler
        speed_1 = 400.0 * SPEED_OF_LIGHT / carrier_frequency
        self.tdl1 = TDLChannel("B", 100e-9, carrier_frequency,
                               max_speed=speed_1, num_rx_ant=num_rx_ant,
                               num_tx_ant=num_tx_ant, rx_corr=rx_corr,
                               tx_corr=tx_corr, normalize=norm_channel)
        # UE 2: TDL-C, 300 ns delay spread, 100 Hz Doppler
        speed_2 = 100.0 * SPEED_OF_LIGHT / carrier_frequency
        self.tdl2 = TDLChannel("C", 300e-9, carrier_frequency,
                               max_speed=speed_2, num_rx_ant=num_rx_ant,
                               num_tx_ant=num_tx_ant, rx_corr=rx_corr,
                               tx_corr=tx_corr, normalize=norm_channel)

    def __call__(self, key: jax.Array, batch_size: int, num_symbols: int,
                 num_sc: int, subcarrier_spacing: float) -> jnp.ndarray:
        """h: [batch, num_rx_ant, num_tx=2, num_tx_ant, sym, sc]."""
        k1, k2 = jax.random.split(key)
        h1 = self.tdl1(k1, batch_size, num_symbols, num_sc,
                       subcarrier_spacing)
        h2 = self.tdl2(k2, batch_size, num_symbols, num_sc,
                       subcarrier_spacing)
        return jnp.stack([h1, h2], axis=2)
