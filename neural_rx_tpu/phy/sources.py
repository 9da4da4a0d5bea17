"""Random symbol sources (reference siona_tf.py:1354-1523
SymbolSource/QAMSource)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constellation import qam_points
from .misc import binary_source
from .mapping import map_bits


def symbol_source(key: jax.Array, shape, points) -> jnp.ndarray:
    """I.i.d. uniform symbols from an arbitrary constellation."""
    points = jnp.asarray(points)
    idx = jax.random.randint(key, shape, 0, points.shape[0])
    return points[idx]


def qam_source(key: jax.Array, shape, num_bits_per_symbol: int
               ) -> jnp.ndarray:
    """I.i.d. uniform QAM symbols (unit average energy)."""
    return symbol_source(key, shape, qam_points(num_bits_per_symbol))


def qam_source_with_bits(key: jax.Array, shape,
                         num_bits_per_symbol: int):
    """(symbols, bits): random bits mapped to QAM (for tests that need
    the generating bits)."""
    bits = binary_source(key, tuple(shape) + (num_bits_per_symbol,))
    flat = bits.reshape(bits.shape[:-2] + (-1,))
    return map_bits(flat, qam_points(num_bits_per_symbol)), bits
