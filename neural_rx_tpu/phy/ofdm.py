"""OFDM modulation/demodulation (IFFT/FFT + cyclic prefix).

Parity target: reference `utils/siona_tf.py:4407-4560` (OFDMModulator with
CP insertion; OFDMDemodulator with CP removal, FFT and phase compensation).
The grid convention matches Sionna: subcarriers are ordered from most
negative to most positive frequency, so modulation ifftshifts before the
IFFT and demodulation fftshifts after the FFT.

Only used on the CFO impairment path and time-domain experiments; the
channel itself is applied in the frequency domain (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax.numpy as jnp


def ofdm_modulate(x: jnp.ndarray, cp_length: int) -> jnp.ndarray:
    """Freq-domain grid -> time samples with CP.

    x: [..., num_ofdm_symbols, fft_size] complex.
    Returns [..., num_ofdm_symbols * (fft_size + cp_length)].
    """
    fft_size = x.shape[-1]
    xt = jnp.fft.ifft(jnp.fft.ifftshift(x, axes=-1), axis=-1, norm="ortho")
    if cp_length > 0:
        xt = jnp.concatenate([xt[..., -cp_length:], xt], axis=-1)
    return xt.reshape(x.shape[:-2] + (-1,))


def ofdm_demodulate(y: jnp.ndarray, fft_size: int, cp_length: int
                    ) -> jnp.ndarray:
    """Time samples -> freq-domain grid (drops CP).

    y: [..., num_symbols * (fft_size + cp_length)].
    Returns [..., num_symbols, fft_size].
    """
    sym_len = fft_size + cp_length
    num_sym = y.shape[-1] // sym_len
    yt = y[..., : num_sym * sym_len].reshape(y.shape[:-1] + (num_sym, sym_len))
    yt = yt[..., cp_length:]
    yf = jnp.fft.fft(yt, axis=-1, norm="ortho")
    return jnp.fft.fftshift(yf, axes=-1)
