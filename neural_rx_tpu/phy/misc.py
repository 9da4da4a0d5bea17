"""Small PHY utilities: SNR conversion, AWGN, bit sources.

ebnodb2no reproduces the reference's rate-adjusted SNR semantics
(`utils/siona_tf.py:3125`, used at `utils/e2e_model copy.py:483-488`):
N0 = 1 / (Eb/N0 * Qm * R) scaled by the resource-grid overhead factor
num_resource_elements / num_data_symbols (pilot + guard overhead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ebnodb2no(ebno_db, num_bits_per_symbol: int, coderate: float,
              num_resource_elements: int | None = None,
              num_data_symbols: int | None = None):
    """Eb/N0 [dB] -> complex noise variance N0 (unit signal energy)."""
    ebno = 10.0 ** (jnp.asarray(ebno_db, jnp.float32) / 10.0)
    no = 1.0 / (ebno * num_bits_per_symbol * coderate)
    if num_resource_elements is not None and num_data_symbols is not None:
        no = no * (num_resource_elements / num_data_symbols)
    return no


def complex_awgn(key: jax.Array, shape, no) -> jnp.ndarray:
    """CN(0, no) noise: real/imag each N(0, no/2). `no` broadcasts."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(jnp.asarray(no, jnp.float32) / 2.0)
    re = jax.random.normal(kr, shape, jnp.float32)
    im = jax.random.normal(ki, shape, jnp.float32)
    return (re + 1j * im) * std.astype(jnp.complex64)


def binary_source(key: jax.Array, shape) -> jnp.ndarray:
    """I.i.d. uniform bits in {0., 1.} (reference BinarySource,
    siona_tf.py:1311)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.float32)


def zf_precoder(h: jnp.ndarray) -> jnp.ndarray:
    """Zero-forcing precoding matrices with per-column normalization
    (reference ZFPrecoder, siona_tf.py:2952): h [..., rx, tx] ->
    W = h^H (h h^H)^{-1}, columns scaled to unit norm."""
    hh = jnp.einsum("...rt,...st->...rs", h, jnp.conj(h))  # H H^H
    w = jnp.einsum("...tr,...rs->...ts",
                   jnp.conj(jnp.swapaxes(h, -1, -2)),
                   jnp.linalg.inv(hh))  # H^H (H H^H)^-1: [..., tx, rx]
    norm = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=-2, keepdims=True))
    return w / jnp.maximum(norm, 1e-12)
