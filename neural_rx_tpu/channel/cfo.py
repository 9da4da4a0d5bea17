"""Carrier frequency offset impairment (reference utils/impairments.py).

Per-UE random CFO uniform in [-max_rel_offset, +max_rel_offset] (relative
to the sampling rate), applied in the time domain: OFDM-modulate the
frequency-domain grid, multiply by exp(j 2 pi fo t), demodulate back
(reference impairments.py:77-110). Constant (maximum) offset at eval
(parameters.py:464).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..phy.ofdm import ofdm_modulate, ofdm_demodulate


class FrequencyOffset:
    def __init__(self, max_rel_offset: float, cp_length: int = 0,
                 constant_offset: bool = False):
        self.max_rel_offset = float(max_rel_offset)
        self.min_rel_offset = (self.max_rel_offset if constant_offset
                               else -self.max_rel_offset)
        self.cp_length = cp_length

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """x: [batch, num_tx, num_ports, num_sym, fft] freq-domain grid."""
        if self.max_rel_offset == 0.0 and self.min_rel_offset == 0.0:
            return x
        fft_size = x.shape[-1]
        xt = ofdm_modulate(x, self.cp_length)  # [..., time]
        n_t = xt.shape[-1]
        fo = jax.random.uniform(
            key, x.shape[:2] + (1, 1), minval=self.min_rel_offset,
            maxval=max(self.max_rel_offset, self.min_rel_offset + 1e-30))
        t = jnp.arange(n_t, dtype=jnp.float32).reshape(1, 1, 1, -1)
        phase = 2.0 * jnp.pi * fo * t
        xt = xt * jnp.exp(1j * phase.astype(jnp.complex64))
        return ofdm_demodulate(xt, fft_size, self.cp_length)
