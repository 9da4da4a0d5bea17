"""OFDM resource grid for PUSCH (static description + mapping ops).

TPU-native replacement for Sionna's ResourceGrid / ResourceGridMapper /
ResourceGridDemapper as used by the reference
(`utils/siona_tf.py:1908-2363`, consumed at `utils/neural_rx.py:849-855`).

Design: the grid is a *static* object built at configuration time. All
index maps (data-RE gather/scatter indices, pilot masks, per-slot DMRS
grids) are NumPy constants; the jnp ops on the hot path are a single
scatter (mapping) or gather (demapping) with static indices, which XLA
lowers to efficient strided updates on TPU.

The PUSCH grid has no guard carriers or DC null: all 12*n_prb subcarriers
are effective (fft_size == num_effective_subcarriers in the reference's
PUSCH configuration).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class ResourceGrid:
    """Static resource grid shared by all UEs of one PUSCH configuration.

    Parameters
    ----------
    pusch_configs : list of PUSCHConfig, one per UE (same carrier/DMRS
        structure, different ports/scrambling).
    """

    def __init__(self, pusch_configs):
        from .nr.pusch import PUSCHConfig  # noqa: F401 (typing only)
        self.configs = list(pusch_configs)
        c0 = self.configs[0]
        self.num_tx = len(self.configs)
        self.num_ofdm_symbols = c0.num_symbols_total
        self.num_subcarriers = c0.num_subcarriers
        self.num_slots_per_frame = c0.num_slots_per_frame
        # CP is never materialized (freq-domain simulation), but its
        # energy overhead enters the Eb/No definition exactly as in the
        # reference's ebnodb2no (siona_tf.py:3185-3190): normal CP is
        # 144/2048 of the symbol for every numerology.
        self.cp_overhead = 144.0 / 2048.0
        self.cyclic_prefix_length = int(round(self.cp_overhead
                                              * self.num_subcarriers))

        # Pilot mask: identical for every UE (union of CDM groups w/o data)
        self.pilot_mask = c0.pilot_mask()  # [14, sc] bool
        alloc_mask = np.zeros((self.num_ofdm_symbols,
                               self.num_subcarriers), bool)
        s0, ns = c0.symbol_allocation
        alloc_mask[s0:s0 + ns] = True
        self.data_mask = alloc_mask & ~self.pilot_mask

        # Flat row-major (symbol-major) data indices
        flat = np.flatnonzero(self.data_mask.reshape(-1))
        self.data_ind = flat.astype(np.int32)  # [num_data_res]
        self.num_data_symbols = int(flat.size)  # data REs per layer
        self.num_pilot_symbols = int(self.pilot_mask.sum())
        self.num_resource_elements = int(alloc_mask.sum())

        # Per-slot DMRS grid bank: [num_slots, num_tx, 14, sc] complex64.
        # (reference precomputes pilots for all slot numbers,
        # parameters.py:227-239, and randomizes the slot during training)
        self.dmrs_grids = np.stack([
            np.stack([cfg.dmrs_grid(slot) for cfg in self.configs])
            for slot in range(self.num_slots_per_frame)
        ]).astype(np.complex64)

        # Per-TX pilot values over the pilot mask (incl. zeros on the other
        # CDM group) — the analog of Sionna PilotPattern.pilots.
        pm = self.pilot_mask.reshape(-1)
        self.pilots = np.stack([
            g.reshape(self.num_slots_per_frame, self.num_tx, -1)[..., pm]
            for g in [self.dmrs_grids]
        ])[0]  # [num_slots, num_tx, num_pilot_symbols]

    # ------------------------------------------------------------------
    # Hot-path ops (pure jnp, static indices)
    # ------------------------------------------------------------------
    def map_data(self, symbols: jnp.ndarray) -> jnp.ndarray:
        """Scatter data symbols into an empty grid.

        symbols: [..., num_data_symbols] -> [..., 14, num_subcarriers].
        """
        n_re = self.num_ofdm_symbols * self.num_subcarriers
        flat = jnp.zeros(symbols.shape[:-1] + (n_re,), symbols.dtype)
        flat = flat.at[..., self.data_ind].set(symbols)
        return flat.reshape(symbols.shape[:-1]
                            + (self.num_ofdm_symbols, self.num_subcarriers))

    def demap_data(self, grid: jnp.ndarray) -> jnp.ndarray:
        """Gather data REs: [..., 14, sc(, ch)] -> [..., n_data(, ch)].

        Works on both complex grids and LLR grids with a trailing
        per-RE channel axis (the reference's ResourceGridDemapper role).
        """
        if grid.ndim >= 2 and grid.shape[-2:] == (self.num_ofdm_symbols,
                                                  self.num_subcarriers):
            flat = grid.reshape(grid.shape[:-2] + (-1,))
            return flat[..., self.data_ind]
        # trailing channel dim: [..., 14, sc, ch]
        assert grid.shape[-3:-1] == (self.num_ofdm_symbols,
                                     self.num_subcarriers)
        ch = grid.shape[-1]
        flat = grid.reshape(grid.shape[:-3] + (-1, ch))
        return flat[..., self.data_ind, :]

    def dmrs_grid_slot(self, slot_idx) -> jnp.ndarray:
        """DMRS grid for a (possibly traced) slot index:
        [num_tx, 14, sc] complex."""
        bank = jnp.asarray(self.dmrs_grids)
        return jnp.take(bank, slot_idx, axis=0)

    @property
    def effective_subcarrier_ind(self) -> np.ndarray:
        """Indices of effective (non-nulled) subcarriers. The PUSCH BWP
        grid has no guard/DC nulls (fft_size == effective count), so
        this is the identity — kept for API parity with the reference's
        RemoveNulledSubcarriers (neural_rx.py:884-913)."""
        return np.arange(self.num_subcarriers)

    def remove_nulled_subcarriers(self, grid: jnp.ndarray) -> jnp.ndarray:
        """Slice effective subcarriers (identity for PUSCH grids)."""
        return grid[..., self.effective_subcarrier_ind]
