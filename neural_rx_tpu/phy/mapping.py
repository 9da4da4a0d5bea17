"""Bit↔symbol mapping and LLR demapping (maxlog / app).

Parity targets: reference `utils/siona_tf.py:100-521` (SymbolLogits2LLRs,
Demapper) and `:1191-1310` (Mapper). Re-designed as vectorized jnp ops:
the mapper is a single gather from the point table; the demapper reduces
over constellation points with logsumexp (app) or max (maxlog).

LLR sign convention follows Sionna: llr = log(Pr(b=1)/Pr(b=0)), i.e.
positive LLR means bit 1 (reference flips the sign only at the ONNX/Aerial
boundary, neural_rx.py:1810).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constellation import bit_labels


def map_bits(bits: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Map bits to constellation symbols.

    bits: [..., n*m] in {0,1}; points: [2^m] complex.
    Returns [..., n] complex symbols.
    """
    points = jnp.asarray(points)
    m = int(np.log2(points.shape[0]))
    b = bits.reshape(bits.shape[:-1] + (-1, m)).astype(jnp.int32)
    weights = (2 ** jnp.arange(m - 1, -1, -1)).astype(jnp.int32)
    idx = jnp.sum(b * weights, axis=-1)
    return points[idx]


def _bit_masks(num_bits_per_symbol: int):
    """(mask1, mask0): [m, 2^m] one where point's bit j is 1 (resp. 0)."""
    labels = bit_labels(num_bits_per_symbol)  # [2^m, m]
    mask1 = labels.T  # [m, 2^m]
    mask0 = 1.0 - mask1
    return jnp.asarray(mask1), jnp.asarray(mask0)


def _exponents(y: jnp.ndarray, points: jnp.ndarray, no: jnp.ndarray):
    """-|y - c|^2 / no for every constellation point: [..., 2^m]."""
    d2 = jnp.abs(y[..., None] - jnp.asarray(points)) ** 2
    return -d2 / no[..., None]


def demap_maxlog(y: jnp.ndarray, points: jnp.ndarray, no: jnp.ndarray
                 ) -> jnp.ndarray:
    """Max-log LLRs. y: [...], no: broadcastable to y. Out: [..., m]."""
    m = int(np.log2(points.shape[0]))
    mask1, mask0 = _bit_masks(m)
    exp = _exponents(y, points, jnp.broadcast_to(no, y.shape))
    neg_inf = jnp.asarray(-1e30, exp.dtype)
    exp1 = jnp.where(mask1 > 0, exp[..., None, :], neg_inf)
    exp0 = jnp.where(mask0 > 0, exp[..., None, :], neg_inf)
    return jnp.max(exp1, axis=-1) - jnp.max(exp0, axis=-1)


def demap_app(y: jnp.ndarray, points: jnp.ndarray, no: jnp.ndarray
              ) -> jnp.ndarray:
    """Exact a-posteriori LLRs via logsumexp."""
    m = int(np.log2(points.shape[0]))
    mask1, mask0 = _bit_masks(m)
    exp = _exponents(y, points, jnp.broadcast_to(no, y.shape))
    neg_inf = jnp.asarray(-1e30, exp.dtype)
    exp1 = jnp.where(mask1 > 0, exp[..., None, :], neg_inf)
    exp0 = jnp.where(mask0 > 0, exp[..., None, :], neg_inf)
    lse1 = jax.scipy.special.logsumexp(exp1, axis=-1)
    lse0 = jax.scipy.special.logsumexp(exp0, axis=-1)
    return lse1 - lse0
