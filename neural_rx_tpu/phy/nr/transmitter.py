"""PUSCH transmitter: TB encode -> QAM map -> RG map -> DMRS -> precode.

First-party replacement for Sionna's PUSCHTransmitter as used by the
reference (`utils/parameters.py:242-261`, output_domain="freq",
return_bits=False). One transmitter per MCS; each handles all UEs of that
MCS (per-UE scrambling via n_rnti/n_id, per-UE DMRS ports, per-UE codebook
precoding).

Hot path is pure jnp under jit: the per-UE loop is unrolled at trace time
(max 2-4 UEs), TB encoding is vectorized over the batch, and the grid
scatter uses static indices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constellation import Constellation
from ..mapping import map_bits
from ..grid import ResourceGrid
from .tb import tb_encode


class PUSCHTransmitter:
    """Frequency-domain PUSCH transmitter for one MCS, all UEs.

    Call: bits [batch, num_tx, tb_size] -> x [batch, num_tx,
    num_antenna_ports, 14, num_subcarriers] complex64.
    """

    def __init__(self, pusch_configs, trainable_constellation: bool = False):
        self.configs = list(pusch_configs)
        c0 = self.configs[0]
        self.resource_grid = ResourceGrid(self.configs)
        self.num_bits_per_symbol = c0.num_bits_per_symbol
        self.target_coderate = c0.target_coderate
        self.tb_size = c0.tb_size
        self.num_coded_bits = c0.num_coded_bits
        self.constellation = Constellation(self.num_bits_per_symbol,
                                           trainable=trainable_constellation)
        # [num_tx, num_ports, 1]
        self.w = np.stack([c.precoding_matrix() for c in self.configs])
        self.num_antenna_ports = c0.num_antenna_ports

    def __call__(self, bits: jnp.ndarray, slot_idx=None,
                 constellation_points: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        """bits [batch, num_tx, tb_size] -> x [batch, num_tx, ports, 14, sc].

        slot_idx: traced or static slot number selecting the DMRS bank
        entry (training randomizes it; reference e2e_model.py:211-217).
        constellation_points: optional trainable point set (e2e learning).
        """
        rg = self.resource_grid
        if slot_idx is None:
            slot_idx = self.configs[0].carrier.slot_number
        if constellation_points is None:
            constellation_points = Constellation.points(
                jnp.asarray(self.constellation._init_points), center=False)

        # Per-UE TB encode (different scrambling per UE) -> data symbols
        grids = []
        for i, cfg in enumerate(self.configs):
            coded = tb_encode(cfg.tb, bits[:, i])  # [batch, G]
            syms = map_bits(coded, constellation_points)  # [batch, n_data]
            grids.append(rg.map_data(syms))  # [batch, 14, sc]
        x = jnp.stack(grids, axis=1)  # [batch, num_tx, 14, sc]

        # Add DMRS (pre-precoding, single layer per UE)
        dmrs = rg.dmrs_grid_slot(slot_idx)  # [num_tx, 14, sc]
        x = x + dmrs[None]

        # Codebook precoding: port p carries w[tx, p] * layer signal
        w = jnp.asarray(self.w)[..., 0]  # [num_tx, ports]
        x = x[:, :, None] * w[None, :, :, None, None]
        return x  # [batch, num_tx, ports, 14, sc]
