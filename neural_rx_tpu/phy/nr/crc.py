"""CRC encoding/checking, 38.212 §5.1 — MXU-friendly formulation.

CRC over GF(2) is linear, so for a fixed payload length A the CRC is
``crc = (bits @ G) mod 2`` with a precomputed [A, L] generator matrix.
On TPU this is a single bf16/f32 matmul feeding the MXU instead of a
bit-serial scan (sums stay < 2^24, exactly representable in f32).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# Generator polynomials, MSB-first coefficient lists excluding the leading 1.
CRC_POLYS = {
    "CRC24A": (24, 0x864CFB),
    "CRC24B": (24, 0x800063),
    "CRC24C": (24, 0xB2B117),
    "CRC16": (16, 0x11021 & 0xFFFF),
    "CRC11": (11, 0x621 & 0x7FF),
    "CRC6": (6, 0x61 & 0x3F),
}


def _crc_remainder_bits(bits: np.ndarray, length: int, poly: int
                        ) -> np.ndarray:
    """Bit-serial polynomial division (NumPy oracle / matrix builder)."""
    reg = np.zeros(length, np.int8)
    poly_bits = np.array([(poly >> (length - 1 - i)) & 1
                          for i in range(length)], np.int8)
    for b in bits:
        fb = reg[0] ^ b
        reg = np.roll(reg, -1)
        reg[-1] = 0
        if fb:
            reg ^= poly_bits
    return reg


@functools.lru_cache(maxsize=64)
def crc_generator_matrix(num_bits: int, crc_type: str) -> np.ndarray:
    """[num_bits, L] GF(2) matrix: crc = bits @ G mod 2.

    Built column-wise from the CRC of unit vectors (linearity).
    The unit-vector CRC only depends on the bit's distance from the end,
    so a single length-num_bits division fills all rows.
    """
    length, poly = CRC_POLYS[crc_type]
    g = np.zeros((num_bits, length), np.int8)
    # CRC of e_i = remainder of x^(L + num_bits - 1 - i) mod poly.
    reg = np.zeros(length, np.int8)
    reg[-1] = 1  # x^0 about to be shifted in as we go backwards
    # compute remainder of x^(L+k) for k = 0.. by repeated multiply-by-x
    poly_bits = np.array([(poly >> (length - 1 - i)) & 1
                          for i in range(length)], np.int8)
    # remainder of x^L:
    rem = poly_bits.copy()
    g[num_bits - 1] = rem
    for k in range(1, num_bits):
        # multiply rem by x mod poly
        msb = rem[0]
        rem = np.roll(rem, -1)
        rem[-1] = 0
        if msb:
            rem ^= poly_bits
        g[num_bits - 1 - k] = rem
    return g.astype(np.float32)


def crc_attach(bits: jnp.ndarray, crc_type: str) -> jnp.ndarray:
    """Append CRC parity bits along the last axis. bits: [..., A] float."""
    g = jnp.asarray(crc_generator_matrix(bits.shape[-1], crc_type))
    parity = jnp.mod(jnp.round(bits @ g), 2.0)
    return jnp.concatenate([bits, parity], axis=-1)


def crc_check(bits_with_crc: jnp.ndarray, crc_type: str) -> jnp.ndarray:
    """Return boolean [...] CRC-pass flags for payload+CRC arrays."""
    length, _ = CRC_POLYS[crc_type]
    payload = bits_with_crc[..., :-length]
    expected = bits_with_crc[..., -length:]
    g = jnp.asarray(crc_generator_matrix(payload.shape[-1], crc_type))
    parity = jnp.mod(jnp.round(payload @ g), 2.0)
    return jnp.all(parity == expected, axis=-1)
