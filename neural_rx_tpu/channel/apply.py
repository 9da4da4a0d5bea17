"""Frequency-domain OFDM channel application + AWGN.

Replaces Sionna's ApplyOFDMChannel (reference applies all channels in the
frequency domain with return_channel=True, SURVEY.md §2.4): one einsum
over (tx, port) — a batched matmul XLA maps onto the MXU — plus complex
AWGN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..phy.misc import complex_awgn


def apply_ofdm_channel(key: jax.Array, x: jnp.ndarray, h: jnp.ndarray,
                       no) -> jnp.ndarray:
    """y = sum_{tx, port} h * x + n.

    x: [batch, num_tx, num_ports, 14, sc] transmitted grids.
    h: [batch, num_rx_ant, num_tx, num_ports, 14, sc] CFRs.
    no: noise variance (broadcastable scalar / [batch]).
    Returns y: [batch, num_rx_ant, 14, sc].
    """
    y = jnp.einsum("batpsc,btpsc->basc", h, x)
    no = jnp.asarray(no, jnp.float32)
    if no.ndim > 0:  # per-batch-sample noise variance
        no = no.reshape(no.shape + (1,) * (y.ndim - no.ndim))
    return y + complex_awgn(key, y.shape, no)
