"""Aerial-layout test-vector generation and engine-output evaluation.

Replacements for the reference's ONNX/Aerial data tooling
(`utils/onnx_utils.py`): `AerialDataGenerator` produces engine inputs in
the Aerial planar-tensor layout together with ground-truth labels
(DataGeneratorAerial, onnx_utils.py:24-410); `AerialDataEvaluator` turns
engine LLR outputs back into BER / TB-CRC metrics (DataEvaluator,
:413-530); `export_static_indices` dumps the precomputed
pilot/PE/gather index tables for non-JAX deployments
(precalculate_nnrx_indices, :533-669).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..phy.misc import binary_source
from ..phy.nr.tb import tb_decode


class AerialDataGenerator:
    """Generate Aerial-layout test vectors from the E2E simulation."""

    def __init__(self, e2e_model, aerial_rx):
        self.model = e2e_model
        self.engine = aerial_rx
        self.rg = e2e_model.transmitters[0].resource_grid

    def __call__(self, key, batch_size: int, ebno_db):
        """Returns (inputs, labels):

        inputs = (rx_slot_real, rx_slot_imag, h_hat_real, h_hat_imag,
                  dmrs_port_mask) in Aerial layout.
        labels = dict(bits, coded_bits, y_grid).
        """
        p = self.model.p
        keys = jax.random.split(key, 6)
        tx0 = self.model.transmitters[0]
        bits = binary_source(keys[0], (batch_size, p.max_num_tx,
                                       tx0.tb_size))
        x = tx0(bits)
        no = self.model._noise_variance(jnp.asarray(ebno_db, jnp.float32))
        y, h = self.model._channel(keys[2], batch_size, x, no)

        # LS at NONZERO pilot REs per TX (the Aerial engine receives
        # per-layer pilot estimates before FOCC removal)
        h_ls = self.model.receiver._ls.ls_at_pilots(y)
        # select this engine's per-TX nonzero pilot subset, Aerial order
        # [b, pilots, layers, ant]
        slot = self.rg.configs[0].carrier.slot_number
        sel = []
        mask_flat = np.flatnonzero(self.rg.pilot_mask.reshape(-1))
        for t in range(p.max_num_tx):
            g = self.rg.dmrs_grids[slot, t].reshape(-1)
            nz = np.abs(g[mask_flat]) > 1e-3
            sel.append(np.where(nz)[0])
        h_sel = jnp.stack([h_ls[:, :, t, sel[t]]
                           for t in range(p.max_num_tx)], axis=2)
        # [b, ant, T, pilots] -> [b, pilots, T, ant]
        h_sel = jnp.transpose(h_sel, (0, 3, 2, 1))

        y_pl = jnp.transpose(y, (0, 3, 2, 1))  # [b, sc, sym, ant]
        inputs = (jnp.real(y_pl), jnp.imag(y_pl),
                  jnp.real(h_sel), jnp.imag(h_sel),
                  jnp.ones((batch_size, p.max_num_tx), jnp.float32))
        from .. sim.e2e import tb_encode_batch
        labels = {"bits": bits,
                  "coded_bits": tb_encode_batch(tx0, bits)}
        return inputs, labels


class AerialDataEvaluator:
    """Engine LLR output -> coded BER and TB-CRC pass rate."""

    def __init__(self, e2e_model):
        self.model = e2e_model
        self.rg = e2e_model.transmitters[0].resource_grid

    def __call__(self, llr_aerial, labels, mcs_idx: int = 0):
        """llr_aerial: [b, layers, sc, sym, bits] SIGN-FLIPPED (Aerial
        convention). Returns dict(ber, crc_pass_rate)."""
        llr = -jnp.transpose(llr_aerial, (0, 1, 3, 2, 4))
        llr_data = self.rg.demap_data(llr)
        llr_flat = llr_data.reshape(llr_data.shape[:2] + (-1,))
        coded = labels["coded_bits"]
        ber = jnp.mean(((llr_flat > 0) != (coded > 0.5)))
        tx0 = self.model.transmitters[mcs_idx]
        crcs = []
        for ue in range(llr_flat.shape[1]):
            _, ok = tb_decode(tx0.configs[ue].tb, llr_flat[:, ue])
            crcs.append(ok)
        return {"coded_ber": float(ber),
                "crc_pass_rate": float(jnp.mean(
                    jnp.stack(crcs).astype(jnp.float32)))}


def export_static_indices(aerial_rx, path: str):
    """Dump the engine's static index tables (.npz): NN gather map,
    FOCC pairs, positional encoding — for non-JAX runtimes
    (reference precalculate_nnrx_indices)."""
    np.savez(path,
             nn_gather=aerial_rx.nn_gather,
             focc_pair=aerial_rx.focc_pair,
             positional_encoding=aerial_rx.pe,
             pilot_mask=aerial_rx.rg.pilot_mask)
