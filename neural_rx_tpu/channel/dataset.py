"""Site-specific ray-traced CIR dataset channel.

Replaces the reference's `DatasetChannel` (utils/channel_models.py:
163-321): loads a dataset of channel impulse responses (a, tau) fully
into memory; training draws random per-UE subsamples from disjoint UE
partitions, evaluation draws paired trajectory samples (UEs at
trajectory offsets), then CIRs are projected onto the OFDM grid in the
frequency domain.

Storage format: the reference uses TFRecords (TensorFlow is not a
dependency here). We define `CIRDataset` over a simple binary format
(see io_native.py — written/read by the first-party C++ reader with an
mmap fast path, NumPy fallback) and also accept .npz archives with
arrays `a` [N, rx_ant, tx_ant, num_paths] complex64 (path gains,
time-invariant per record like the reference's per-position CIRs) and
`tau` [N, num_paths] float32 (delays, seconds).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp


def load_cir_records(path: str):
    """Load (a, tau) from .npz or .cirbin (native reader).

    Configs carry the reference's `.tfrecord` filenames verbatim
    (utils/parameters.py:431-447); the stored artifact here is .cirbin
    (or .npz), so a missing path falls back to the same basename with
    those extensions.
    """
    import os
    if not os.path.exists(path):
        base = os.path.splitext(path)[0]
        for ext in (".cirbin", ".npz"):
            if os.path.exists(base + ext):
                path = base + ext
                break
    if path.endswith(".npz"):
        d = np.load(path)
        return np.asarray(d["a"], np.complex64), \
            np.asarray(d["tau"], np.float32)
    from .io_native import read_cirbin
    return read_cirbin(path)


class DatasetChannel:
    """CIR-dataset channel with train/eval subsampling semantics."""

    def __init__(self, path: str, training: bool, num_tx: int,
                 random_subsampling: bool = True, num_rx_ant: int = 4,
                 num_tx_ant: int = 2, max_num_examples: int = -1):
        a, tau = load_cir_records(path)
        if max_num_examples > 0:
            a, tau = a[:max_num_examples], tau[:max_num_examples]
        n = a.shape[0]
        self.training = training
        self.random_subsampling = random_subsampling
        self.num_tx = num_tx
        # normalize per-record energy (reference applies channel_norm=True
        # for site-specific configs; OFDMChannel normalization happens at
        # application; here we keep raw gains)
        self.a = a
        self.tau = tau
        # training: disjoint per-UE partitions (channel_models.py:230-241)
        part = n // num_tx
        self.partitions = [np.arange(i * part, (i + 1) * part)
                           for i in range(num_tx)]
        # eval: paired trajectory samples at fixed offsets
        # (channel_models.py:296-319)
        self.pair_offset = part

    def __call__(self, key, batch_size: int, num_tx: int,
                 num_symbols: int, num_sc: int,
                 subcarrier_spacing: float) -> jnp.ndarray:
        """h: [batch, rx_ant, num_tx, tx_ant, sym, sc] complex."""
        a = jnp.asarray(self.a)
        tau = jnp.asarray(self.tau)
        n = self.a.shape[0]
        part = n // self.num_tx
        if self.training and self.random_subsampling:
            idx = jax.random.randint(key, (batch_size, num_tx), 0, part)
            idx = idx + jnp.arange(num_tx)[None, :] * part
        else:
            # sequential paired samples along the trajectory
            start = jax.random.randint(key, (batch_size, 1), 0, part)
            idx = start + jnp.arange(num_tx)[None, :] * part
        a_b = a[idx]      # [b, T, rx, tx_ant, paths]
        tau_b = tau[idx]  # [b, T, paths]
        f = (jnp.arange(num_sc) - (num_sc - 1) / 2.0) * subcarrier_spacing
        phase = jnp.exp(-1j * 2 * jnp.pi * f[None, None, None, :]
                        * tau_b[..., None])  # [b, T, paths, sc]
        h = jnp.einsum("btrxp,btpf->brtxf", a_b, phase)
        # static channel across the slot (per-position CIR records)
        h = jnp.broadcast_to(h[..., None, :],
                             h.shape[:-1] + (num_symbols, num_sc))
        return h.astype(jnp.complex64)
