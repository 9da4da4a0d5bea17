"""Gray-coded QAM constellations (unit energy), trainable variant.

Capability parity with the reference's vendored Sionna primitives
(`/root/reference/utils/siona_tf.py:748-1190`: pam_gray/pam/qam,
Constellation with `normalize`/`center`/`trainable`), re-designed as pure
functions over jnp arrays so constellation points can live inside jitted
graphs and be optimized with optax for end-to-end pilotless learning.

Bit convention (matches 38.211 §5.1 QAM and Sionna): for 2^m-QAM the m bits
of a symbol split alternately between I and Q; each axis is a Gray-coded
PAM with the first bit selecting the half-plane sign.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pam_gray_bits(b: np.ndarray) -> float:
    """Map a bit vector to a (unnormalized, odd-integer) Gray PAM level.

    Recursive construction identical in behavior to 38.211 PAM mapping:
    level = (1-2*b0) * (2^(n-1) - gray(rest)) over remaining bits.
    """
    if len(b) == 0:
        return 0.0
    return (1 - 2 * b[0]) * (2 ** (len(b) - 1) - pam_gray_bits(b[1:]))


def qam_points(num_bits_per_symbol: int, normalize: bool = True) -> np.ndarray:
    """Return the 2^m Gray-coded QAM points indexed by their bit label.

    Index i's binary expansion b_0 b_1 ... b_{m-1} (MSB first) gives the
    bits; even-position bits drive the real axis, odd-position bits the
    imaginary axis. With ``normalize`` the constellation has unit average
    energy.
    """
    m = num_bits_per_symbol
    assert m % 2 == 0 and m >= 2, "QAM requires an even number of bits/symbol"
    n = 2**m
    points = np.zeros(n, dtype=np.complex128)
    for i in range(n):
        bits = np.array([(i >> (m - 1 - j)) & 1 for j in range(m)])
        re = pam_gray_bits(bits[0::2])
        im = pam_gray_bits(bits[1::2])
        points[i] = re + 1j * im
    if normalize:
        points /= np.sqrt(np.mean(np.abs(points) ** 2))
    return points.astype(np.complex64)


def bit_labels(num_bits_per_symbol: int) -> np.ndarray:
    """[2^m, m] matrix of the bit label of each constellation index."""
    m = num_bits_per_symbol
    idx = np.arange(2**m)
    return ((idx[:, None] >> (m - 1 - np.arange(m)[None, :])) & 1).astype(
        np.float32
    )


class Constellation:
    """QAM constellation with optional trainability (e2e learning).

    The point set is stored as a real [2, 2^m] array (re/im) so it can be a
    leaf of an optax-optimized pytree. ``apply_constraints`` reproduces the
    reference's `center=True` + unit-energy normalization applied on every
    forward pass (reference parameters.py:256-261 enables `trainable` and
    `center` on the transmitter's constellation).
    """

    def __init__(self, num_bits_per_symbol: int, trainable: bool = False):
        self.num_bits_per_symbol = num_bits_per_symbol
        self.trainable = trainable
        pts = qam_points(num_bits_per_symbol)
        self._init_points = np.stack([pts.real, pts.imag]).astype(np.float32)

    def init_params(self) -> jnp.ndarray:
        """Initial (re, im) point array; a trainable leaf if trainable."""
        return jnp.asarray(self._init_points)

    @staticmethod
    def points(params: jnp.ndarray, center: bool = True) -> jnp.ndarray:
        """Complex unit-energy (and optionally zero-mean) point set."""
        c = params[0] + 1j * params[1]
        if center:
            c = c - jnp.mean(c)
        energy = jnp.mean(jnp.abs(c) ** 2)
        return c / jnp.sqrt(energy)
