"""Transport-block encoder/decoder, 38.212 §5.2.2/§6.2 + scrambling.

Parity target: Sionna's TBEncoder/TBDecoder as used by the reference
(`parameters.py:242-252` builds PUSCHTransmitters whose TBEncoders the
NeuralPUSCHReceiver re-uses to re-encode training labels,
`neural_rx.py:1402-1413,1559-1565`).

Pipeline (all static config in NumPy, hot path pure jnp under jit):
  TB CRC (16 / 24A) -> code-block segmentation (+CRC24B if C>1, filler
  bits) -> QC-LDPC encode -> rate matching per block -> concatenation ->
  scrambling (Gold, c_init = n_rnti*2^15 + n_id).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from . import crc as crc_mod
from .ldpc import get_code, encode as ldpc_encode, decode as ldpc_decode
from .ldpc_tables import select_base_graph, select_lifting_size
from .rate_match import rate_match, rate_recover, cb_bit_allocation
from .sequences import pusch_scrambling_sequence


class TBConfig:
    """Static transport-block configuration for one (TBS, G) pair."""

    def __init__(self, tb_size: int, num_coded_bits: int, qm: int,
                 coderate: float, n_rnti: int = 1, n_id: int = 1,
                 num_layers: int = 1, num_bp_iter: int = 20,
                 cn_type: str = "boxplus"):
        self.tb_size = int(tb_size)  # A
        self.num_coded_bits = int(num_coded_bits)  # G
        self.qm = qm
        self.coderate = coderate
        self.n_rnti = n_rnti
        self.n_id = n_id
        self.num_layers = num_layers
        self.num_bp_iter = num_bp_iter
        self.cn_type = cn_type

        a = self.tb_size
        self.tb_crc = "CRC16" if a <= 3824 else "CRC24A"
        self.tb_crc_len = 16 if a <= 3824 else 24
        b = a + self.tb_crc_len

        self.bg = select_base_graph(a, coderate)
        k_cb = 8448 if self.bg == 1 else 3840
        if b <= k_cb:
            self.num_cbs = 1
            b_prime = b
            self.cb_crc_len = 0
        else:
            self.num_cbs = math.ceil(b / (k_cb - 24))
            b_prime = b + self.num_cbs * 24
            self.cb_crc_len = 24
        assert b_prime % self.num_cbs == 0, "NR TBS guarantees divisibility"
        self.k_prime = b_prime // self.num_cbs

        if self.bg == 1:
            k_b = 22
        else:
            if b > 640:
                k_b = 10
            elif b > 560:
                k_b = 9
            elif b > 192:
                k_b = 8
            else:
                k_b = 6
        self.z = select_lifting_size(self.k_prime, k_b)
        self.code = get_code(self.bg, self.z)
        self.k = self.code.k  # = k_b_graph * z (22Z / 10Z)
        self.num_filler = self.k - self.k_prime
        self.cb_es = cb_bit_allocation(self.num_coded_bits, self.num_cbs,
                                       qm, num_layers)
        # all-equal E is the common case; mixed-E handled per block
        self.scramb_seq = pusch_scrambling_sequence(
            n_rnti, n_id, self.num_coded_bits).astype(np.float32)


def tb_encode(cfg: TBConfig, bits: jnp.ndarray) -> jnp.ndarray:
    """bits [..., A] -> scrambled coded bits [..., G]."""
    b = crc_mod.crc_attach(bits, cfg.tb_crc)  # [..., B]
    blocks = b.reshape(b.shape[:-1] + (cfg.num_cbs, -1))
    if cfg.num_cbs > 1:
        blocks = crc_mod.crc_attach(blocks, "CRC24B")  # [..., C, K']
    filler = jnp.zeros(blocks.shape[:-1] + (cfg.num_filler,), blocks.dtype)
    info = jnp.concatenate([blocks, filler], axis=-1)  # [..., C, K]
    cw = ldpc_encode(cfg.code, info)  # [..., C, n_full]
    outs = []
    for r in range(cfg.num_cbs):
        outs.append(rate_match(cfg.code, cw[..., r, :], cfg.k_prime,
                               cfg.cb_es[r], cfg.qm))
    coded = jnp.concatenate(outs, axis=-1)  # [..., G]
    scr = jnp.asarray(cfg.scramb_seq)
    return jnp.mod(coded + scr, 2.0)


def tb_decode(cfg: TBConfig, llr: jnp.ndarray, decoder=None):
    """llr [..., G] (Sionna convention log(p1/p0)) ->
    (b_hat [..., A], tb_crc_pass [...]).

    decoder: optional codeword decoder fn(llr_internal [..., n_full]) ->
    hard bits, replacing the default flooding BP (used by the pallas
    fast path, kernels/ldpc_pallas.tb_decode_fast).
    """
    if decoder is None:
        def decoder(full):
            return ldpc_decode(cfg.code, full, cfg.num_bp_iter,
                               cfg.cn_type)
    scr = jnp.asarray(cfg.scramb_seq)
    # descramble: flip LLR sign where scrambling bit is 1, then negate to
    # the decoder-internal log(p0/p1) convention
    llr_int = -llr * (1.0 - 2.0 * scr)
    llr_int = jnp.clip(llr_int, -20.0, 20.0)
    cb_bits = []
    offset = 0
    for r in range(cfg.num_cbs):
        e_r = cfg.cb_es[r]
        llr_cb = llr_int[..., offset:offset + e_r]
        offset += e_r
        full = rate_recover(cfg.code, llr_cb, cfg.k_prime, cfg.qm)
        hard = decoder(full)
        cb_bits.append(hard[..., :cfg.k_prime])  # drop filler + parity
    blocks = jnp.stack(cb_bits, axis=-2)  # [..., C, K']
    if cfg.num_cbs > 1:
        payload = blocks[..., :-24]  # strip CB CRC
    else:
        payload = blocks
    b = payload.reshape(payload.shape[:-2] + (-1,))  # [..., B]
    tb_ok = crc_mod.crc_check(b, cfg.tb_crc)
    return b[..., :cfg.tb_size], tb_ok
