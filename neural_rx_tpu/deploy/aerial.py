"""Aerial-compatible real-time receiver entry point.

TPU-native equivalent of the reference's `NeuralReceiverONNX` +
`NRPreprocessing` (`utils/neural_rx.py:1614-1812`): the deployable
engine covers channel-estimate preprocessing (FOCC removal, PRB-local
nearest-neighbor interpolation, positional encoding) + the CGNN
iterations + final LLR readout. TB/LDPC decoding stays outside the
engine, exactly like the reference's TensorRT scope.

I/O contract (per reference neural_rx.py:1731-1771, Aerial axis order):
inputs
  rx_slot_real / rx_slot_imag : [b, num_subcarriers, num_symbols, ant]
  h_hat_real / h_hat_imag     : [b, num_pilots, num_layers, ant]
                                 (LS estimates at nonzero pilot REs,
                                  FOCC not yet removed)
  dmrs_port_mask              : [b, num_layers] active-port mask
outputs (the reference engine returns BOTH, neural_rx.py:1796-1812)
  llr   : [b, num_layers, num_subcarriers, num_symbols, num_bits]
          SIGN-FLIPPED (llr = -log(p1/p0)), the Aerial convention
          (reference flips at neural_rx.py:1810).
  h_hat : [b, num_layers, num_subcarriers, num_symbols, 2*num_rx_ant]
          refined channel estimate from the CGNN chest readout.

Instead of TensorRT dynamic-shape profiles, shapes are static per PRB
bucket; `deploy.aot.compile_buckets` AOT-compiles one executable per
bucket (reference trtexec min/opt/max profiles, export_onnx.py:196-212).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..rx.cgnn import CGNNConfig, cgnn_apply, pilot_positional_encoding


class AerialNRX:
    """Static-shape Aerial-ABI wrapper around the CGNN for one grid."""

    def __init__(self, resource_grid, cgnn_cfg: CGNNConfig,
                 num_it: int | None = None, dtype=jnp.bfloat16,
                 mcs_idx: int = 0):
        rg = resource_grid
        self.rg = rg
        self.cfg = cgnn_cfg
        self.num_it = num_it
        self.dtype = dtype
        self.num_layers = rg.num_tx
        # the engine is compiled for ONE MCS (reference exports one
        # engine per config); one-hot mask selects its IO heads
        self.mcs_idx = mcs_idx

        slot = rg.configs[0].carrier.slot_number
        self.pe = pilot_positional_encoding(
            rg.dmrs_grids[slot], rg.pilot_mask)  # [T, sym, sc, 2]

        # Per-TX nonzero-pilot flat indices & the NN gather map over the
        # full grid (PRB-local by construction: nearest pilot in the same
        # comb is always within the PRB for type-1 DMRS).
        mask = rg.pilot_mask
        n_sym, n_sc = mask.shape
        self.n_sc = n_sc
        self._n_pilots = []
        gathers = []
        focc_pairs = []
        pilot_scs = []
        uniq_pilot_scs = []
        freq_dists = []
        pad_exact = True
        for tx in range(rg.num_tx):
            g = rg.dmrs_grids[slot, tx]
            ip, jp = np.where(np.abs(g) > 1e-3)
            self._n_pilots.append(len(ip))
            d = (np.abs(np.arange(n_sym)[:, None, None] - ip[None, None])
                 + np.abs(np.arange(n_sc)[None, :, None] - jp[None, None]))
            gathers.append(np.argmin(d, -1).astype(np.int32))
            # FOCC removal pairs: adjacent pilot REs within a CDM pair
            # (reference _focc_removal averages over the 2 CDM REs,
            # neural_rx.py:1620-1629)
            pair = np.arange(len(ip)) // 2
            focc_pairs.append(pair.astype(np.int32))
            pilot_scs.append(jp.astype(np.int32))
            # per-subcarrier distance to each UNIQUE pilot subcarrier
            # (for runtime valid-width-aware PE under pad-to-bucket
            # dispatch). Dedup across DMRS symbols + int16 keeps the
            # baked constant small (the full [sc, n_pilots] f32 matrix
            # would be ~40 MB for a 132-PRB 4-layer engine).
            uniq = np.unique(jp)
            uniq_pilot_scs.append(uniq.astype(np.int32))
            freq_dists.append(
                np.abs(np.arange(n_sc)[:, None] - uniq[None, :])
                .astype(np.int16))
            # padded dispatch is LLR-exact iff no valid-region RE ever
            # gathers a pilot from a LATER PRB (valid boundaries are PRB
            # multiples; true for type-1 comb DMRS, where the nearest
            # pilot subcarrier is always within the RE's own PRB):
            jp_g = jp[gathers[-1]]  # [sym, sc] gathered pilot subcarrier
            pad_exact &= bool(np.all(
                jp_g // 12 <= np.arange(n_sc)[None, :] // 12))
        self.nn_gather = np.stack(gathers)  # [T, sym, sc]
        self.focc_pair = np.stack(focc_pairs)  # [T, n_pilots]
        self.num_pilots = self._n_pilots[0]
        self.pilot_sc = np.stack(pilot_scs)  # [T, n_pilots]
        assert len({len(u) for u in uniq_pilot_scs}) == 1
        self.uniq_pilot_sc = np.stack(uniq_pilot_scs)  # [T, U]
        self.freq_dist = np.stack(freq_dists)  # [T, sc, U] int16
        self.pad_dispatch_exact = pad_exact

    def _dynamic_pe(self, num_valid_sc):
        """Positional encoding for a bucket grid whose trailing
        subcarriers are padding: freq distances use only pilots inside
        the valid region, z-scoring runs over valid subcarriers, and the
        padded region is zeroed (matching the implicit zero padding a
        direct execution at the valid width would see). The time channel
        is column-local, so the static precompute stays valid."""
        msc = (jnp.arange(self.n_sc) < num_valid_sc)
        dist = jnp.where(
            jnp.asarray(self.uniq_pilot_sc)[:, None, :] < num_valid_sc,
            jnp.asarray(self.freq_dist),
            jnp.int16(32767)).min(-1).astype(jnp.float32)  # [T, sc]
        nv = num_valid_sc.astype(jnp.float32)
        mean = jnp.sum(dist * msc, -1, keepdims=True) / nv
        var = jnp.sum(jnp.where(msc, dist - mean, 0.0) ** 2, -1,
                      keepdims=True) / nv
        std = jnp.sqrt(var)
        pe_f = jnp.where(msc & (std > 0), (dist - mean)
                         / jnp.where(std > 0, std, 1.0), 0.0)
        pe_t = jnp.asarray(self.pe[..., 0]) * msc  # [T, sym, sc]
        n_sym = pe_t.shape[1]
        pe_f = jnp.broadcast_to(pe_f[:, None], (pe_t.shape[0], n_sym,
                                                self.n_sc))
        return jnp.stack([pe_t, pe_f], axis=-1)

    def __call__(self, params, rx_slot_real, rx_slot_imag, h_hat_real,
                 h_hat_imag, dmrs_port_mask, num_valid_sc=None):
        rg = self.rg
        b = rx_slot_real.shape[0]
        t = self.num_layers
        # Aerial layout [b, sc, sym, ant] -> internal [b, sym, sc, ch]
        yr = jnp.transpose(rx_slot_real, (0, 2, 1, 3))
        yi = jnp.transpose(rx_slot_imag, (0, 2, 1, 3))
        y_in = jnp.concatenate([yr, yi], axis=-1)

        # FOCC removal: average over each CDM pair, then scatter back
        def focc(h):  # [b, pilots, T, ant]
            outs = []
            for tx in range(t):
                pair = jnp.asarray(self.focc_pair[tx])
                hp = h[:, :, tx]  # [b, pilots, ant]
                n_pair = self.num_pilots // 2
                summed = jnp.zeros((b, n_pair, hp.shape[-1]),
                                   hp.dtype).at[:, pair].add(hp) / 2.0
                outs.append(summed[:, pair])
            return jnp.stack(outs, axis=2)  # [b, pilots, T, ant]

        hr = focc(h_hat_real)
        hi = focc(h_hat_imag)
        # NN-interpolate over the grid per TX: [b, T, sym, sc, ant]
        gi = jnp.asarray(self.nn_gather)  # [T, sym, sc]
        hr_t = jnp.transpose(hr, (0, 2, 1, 3))  # [b, T, pilots, ant]
        hi_t = jnp.transpose(hi, (0, 2, 1, 3))
        tx_idx = jnp.arange(t)[:, None, None]
        hr_g = hr_t[:, tx_idx, gi]  # [b, T, sym, sc, ant]
        hi_g = hi_t[:, tx_idx, gi]
        h_in = jnp.concatenate([hr_g, hi_g], axis=-1)

        mcs_mask = jnp.tile(
            jax.nn.one_hot(self.mcs_idx, self.cfg.num_mcs)[None, None],
            (b, t, 1))
        if num_valid_sc is None:
            pe = jnp.asarray(self.pe)
        else:
            num_valid_sc = jnp.asarray(num_valid_sc, jnp.int32)
            pe = self._dynamic_pe(num_valid_sc)
        llrs, h_hats = cgnn_apply(
            params["cgnn"], self.cfg, y_in, pe, h_in,
            dmrs_port_mask.astype(jnp.float32), mcs_mask,
            num_it=self.num_it, dtype=self.dtype, sc_valid=num_valid_sc)
        llr = llrs[-1][self.mcs_idx]  # [b, T, sym, sc, bits]
        h_hat = h_hats[-1]            # [b, T, sym, sc, 2*ant]
        # Aerial order [b, T, sc, sym, ch], sign-flipped LLRs; the
        # engine returns BOTH tensors like the reference's exported
        # engine (NeuralReceiverONNX.forward returns (llr, h_hat),
        # reference neural_rx.py:1796-1812)
        return (-jnp.transpose(llr, (0, 1, 3, 2, 4)),
                jnp.transpose(h_hat, (0, 1, 3, 2, 4)))
