"""NeuralPUSCHReceiver: LS init + CGNN + TB decode (+ training losses).

TPU-native re-design of the reference's CGNNOFDM / NeuralPUSCHReceiver
(`utils/neural_rx.py:598-881, 1384-1603`; original TF semantics from
`utils/neural_rx copy_pytorch.py:712-790`).

Differences from the reference are layout-only: grids are
[batch, (num_tx,) sym, sc, channels] (channels-last for TPU convs), and
the TB decoder is the first-party LDPC/BP chain. Functional math is
identical: fixed-N0 (0.1) LS + nearest-pilot interpolation as CGNN input,
power normalization inside CGNN, per-MCS readouts, BCE data loss masked
by (mcs_ue_mask, active_tx) + MSE chest loss masked by active_tx.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..phy.chest import LSChannelEstimator
from ..phy.nr.tb import tb_decode
from .cgnn import (CGNNConfig, init_cgnn_params, cgnn_apply,
                   pilot_positional_encoding, count_params)

# Reference estimate_channel calls the LS estimator with a hard-coded
# noise variance of 1e-1 (`neural_rx copy_pytorch.py:905`): the estimate
# h_ls does not depend on it, and err_var is not fed to the CGNN.
_LS_FIXED_NO = 0.1


class NeuralPUSCHReceiver:
    """Static configuration + functional apply for the neural receiver."""

    def __init__(self, transmitters, num_rx_ant: int, max_num_tx: int,
                 num_it: int, d_s: int, num_units_init, num_units_agg,
                 num_units_state, num_units_readout,
                 layer_type_conv: str = "sepconv",
                 var_mcs_masking: bool = False,
                 initial_chest: str | None = "ls",
                 mask_pilots: bool = False,
                 nrx_dtype=jnp.float32,
                 fused_convs: bool | None = None,
                 fused_iteration: bool | None = None):
        import os
        if fused_convs is None:
            # deployment switch: flipped once the on-chip A/B
            # (scripts/bench_fused_convs.py) decides the winner
            fused_convs = os.environ.get("NRX_FUSED_CONVS", "0") == "1"
        if fused_iteration is None:
            # serving-only (no VJP): enable explicitly or via env
            fused_iteration = os.environ.get("NRX_FUSED_ITER", "0") == "1"
        self.transmitters = list(transmitters)  # one per MCS
        self.rg = self.transmitters[0].resource_grid
        self.num_rx_ant = num_rx_ant
        self.max_num_tx = max_num_tx
        self.initial_chest = initial_chest
        self.mask_pilots = mask_pilots
        self.nrx_dtype = nrx_dtype
        self.num_mcs = len(self.transmitters)

        num_bits = tuple(t.num_bits_per_symbol for t in self.transmitters)
        self.cgnn_cfg = CGNNConfig(
            num_bits_per_symbol=num_bits, num_rx_ant=num_rx_ant,
            num_it=num_it, d_s=d_s,
            num_units_init=tuple(num_units_init),
            num_units_agg=tuple(tuple(u) for u in num_units_agg),
            num_units_state=tuple(tuple(u) for u in num_units_state),
            num_units_readout=tuple(num_units_readout),
            layer_type_conv=layer_type_conv,
            var_mcs_masking=var_mcs_masking,
            initial_chest=initial_chest is not None,
            fused_convs=fused_convs,
            fused_iteration=fused_iteration)

        # Positional encoding from the configured slot's DMRS positions
        slot = self.rg.configs[0].carrier.slot_number
        self.pe = pilot_positional_encoding(self.rg.dmrs_grids[slot],
                                            self.rg.pilot_mask)
        # [max_num_tx, sym, sc, 2]
        self.pe = self.pe[:max_num_tx]

        if initial_chest == "ls":
            assert not mask_pilots, \
                "cannot use initial channel estimator with masked pilots"
            self._ls = LSChannelEstimator(self.rg, "nn")
        else:
            self._ls = None

        # Per-UE precoding matrices of the first MCS's configs (ground
        # truth preprocessing; identical across MCS in the reference)
        self.w = np.stack([c.precoding_matrix()
                           for c in self.transmitters[0].configs])
        # pilot-mask flat indices for e2e pilot masking
        self._pilot_flat = np.flatnonzero(self.rg.pilot_mask.reshape(-1))

    # -- params ----------------------------------------------------------
    def init_params(self, key) -> dict:
        return {"cgnn": init_cgnn_params(key, self.cgnn_cfg)}

    def num_params(self, params) -> int:
        return count_params(params)

    # -- shared input pipeline -------------------------------------------
    def _prepare_inputs(self, y, slot_idx=None):
        """y complex [b, rx_ant, sym, sc] -> (y_in, h_in).

        y_in: [b, sym, sc, 2*rx_ant] real; h_in: [b, T, sym, sc, 2*rx_ant]
        real (LS estimate) or None. slot_idx selects the DMRS values the
        transmitter actually used (training randomizes the slot).
        """
        if self.mask_pilots:
            b, a = y.shape[:2]
            flat = y.reshape(b, a, -1)
            flat = flat.at[..., self._pilot_flat].set(0.0)
            y = flat.reshape(y.shape)
        # planar fast path: one re/im stack, then everything real
        # (avoids complex transposes + the multi-index-dim NN gather;
        # ~0.3 ms/slot cheaper at 132 PRB batch 1)
        b, ant = y.shape[0], y.shape[1]
        y_pl = jnp.stack([y.real, y.imag], axis=-1)  # [b, ant, 14, sc, 2]
        # [b, sym, sc, 2*ant], channel order [re a0.., im a0..] — same as
        # concat([moveaxis(real), moveaxis(imag)], -1). On bf16 surfaces
        # round before the transpose (cgnn_apply's power norm upcasts to
        # f32 internally, so this only moves the rounding earlier and
        # halves the transpose traffic); LS estimation keeps f32 y_pl.
        y_t = (y_pl.astype(self.nrx_dtype)
               if self.nrx_dtype == jnp.bfloat16 else y_pl)
        y_in = jnp.moveaxis(y_t, 1, -1).reshape(
            b, y.shape[2], y.shape[3], 2 * ant)
        h_in = None
        if self._ls is not None:
            if self._ls.interpolation_type == "nn":
                # serving (bf16) surfaces gather/transpose in bf16;
                # f32 parity evals keep the f32 path (out_dtype=None)
                od = (self.nrx_dtype
                      if self.nrx_dtype == jnp.bfloat16 else None)
                import os as _os
                if (self._ls._dense_ok
                        and _os.environ.get("NRX_DENSE_LS", "1") == "1"):
                    # gather-free comb-factorized NN (bit-exact vs the
                    # gather path; see chest._build_dense_nn)
                    h_in = self._ls.estimate_planar_dense(
                        y_pl, slot_idx=slot_idx, out_dtype=od)
                else:
                    h_in = self._ls.estimate_planar(
                        y_pl, slot_idx=slot_idx, out_dtype=od)
                h_in = h_in[:, :self.max_num_tx]
            else:
                h_hat, _ = self._ls(y, _LS_FIXED_NO, slot_idx=slot_idx)
                h_hat = h_hat[:, :, :self.max_num_tx]
                h_in = jnp.concatenate(
                    [jnp.moveaxis(h_hat.real, 1, -1),
                     jnp.moveaxis(h_hat.imag, 1, -1)], axis=-1)
            # [b, T, sym, sc, 2*ant]
        return y_in, h_in

    def preprocess_channel_ground_truth(self, h):
        """h: [b, rx_ant, num_tx, num_ports, sym, sc] complex ->
        effective per-UE channel [b, T, sym, sc, 2*rx_ant] real
        (reference neural_rx.py:1516-1542: apply precoding, re/im stack).
        """
        w = jnp.asarray(self.w[:, :, 0])  # [T, ports]
        h_eff = jnp.einsum("batpsc,tp->batsc", h, w)
        return jnp.concatenate(
            [jnp.moveaxis(h_eff.real, 1, -1),
             jnp.moveaxis(h_eff.imag, 1, -1)], axis=-1)

    # -- evaluation ------------------------------------------------------
    def apply(self, params, y, active_tx, mcs_arr_eval=(0,),
              mcs_ue_mask=None, num_it: int | None = None,
              fast_ldpc: bool = False, slot_idx=None):
        """Eval forward: returns (b_hat, h_hat_refined, h_hat_init, crc).

        y: [b, rx_ant, sym, sc] complex; active_tx: [b, max_num_tx].
        b_hat: [b, T, tb_size] for the first evaluated MCS.
        fast_ldpc: use the pallas layered min-sum decoder (TPU fast
        path) instead of the reference-faithful flooding boxplus.
        """
        b = y.shape[0]
        if mcs_ue_mask is None:
            mcs_ue_mask = jax.nn.one_hot(
                jnp.full((b, self.max_num_tx), mcs_arr_eval[0]),
                self.num_mcs)
        y_in, h_in = self._prepare_inputs(y, slot_idx)
        llrs, h_hats = cgnn_apply(
            params["cgnn"], self.cgnn_cfg, y_in, jnp.asarray(self.pe),
            h_in, active_tx, mcs_ue_mask, num_it=num_it,
            training=False, dtype=self.nrx_dtype)
        if not h_hats:
            # every cgnn_apply mode (including fused_readout, whose
            # kernel now runs BOTH in-VMEM readouts and returns
            # (llr, h_hat) like the reference's deployed engine,
            # neural_rx.py:1796-1812) populates h_hats; an empty list
            # means a truncated/failed forward
            raise ValueError(
                "cgnn_apply returned no chest readout — receiver eval "
                "needs h_hat")
        # eval decodes ONE MCS per call: mcs_arr_eval[0] (matching the
        # reference's single-TBDecoder eval simplification,
        # neural_rx.py:1581-1603). Mixed-MCS scenarios go through
        # sim.mixed_mcs, which schedules the other MCSs on the other UEs
        # and reads back only UE 0; calling apply() expecting every
        # UE's own-MCS bits is a misuse.
        mcs0 = mcs_arr_eval[0]
        llr = llrs[-1][mcs0]  # [b, T, sym, sc, bits]
        llr_data = self.rg.demap_data(llr)  # [b, T, n_data, bits]
        llr_flat = llr_data.reshape(llr_data.shape[:2] + (-1,))  # [b,T,G]
        # TB decode per UE (per-UE scrambling), unrolled over max_num_tx
        if fast_ldpc:
            from ..kernels.ldpc_pallas import tb_decode_fast as _decode
        else:
            _decode = tb_decode
        b_hats, crcs = [], []
        for ue in range(self.max_num_tx):
            tb_cfg = self.transmitters[mcs0].configs[ue].tb
            bh, ok = _decode(tb_cfg, llr_flat[:, ue])
            b_hats.append(bh)
            crcs.append(ok)
        return (jnp.stack(b_hats, 1), h_hats[-1], h_in,
                jnp.stack(crcs, 1))

    # -- training --------------------------------------------------------
    def training_loss(self, params, y, active_tx, bits_list, h,
                      mcs_ue_mask, mcs_arr_eval=None,
                      apply_multiloss: bool = False,
                      num_it: int | None = None, slot_idx=None):
        """Training forward returning (loss_data, loss_chest).

        bits_list: list over evaluated MCS of coded-bit LABELS
        [b, T, G_mcs] (TB-encoded payloads — caller re-encodes, matching
        reference neural_rx.py:1559-1565).
        h: ground-truth CFR [b, rx_ant, T, ports, sym, sc] or None.
        """
        if mcs_arr_eval is None:
            mcs_arr_eval = list(range(self.num_mcs))
        y_in, h_in = self._prepare_inputs(y, slot_idx)
        llrs, h_hats = cgnn_apply(
            params["cgnn"], self.cgnn_cfg, y_in, jnp.asarray(self.pe),
            h_in, active_tx, mcs_ue_mask, num_it=num_it, training=True,
            apply_multiloss=apply_multiloss, dtype=self.nrx_dtype)

        h_label = None
        if h is not None:
            h_label = self.preprocess_channel_ground_truth(h)

        loss_data = jnp.float32(0.0)
        for llrs_it in llrs:  # readout points
            for li, idx in enumerate(mcs_arr_eval):
                llr = llrs_it[idx]
                llr_data = self.rg.demap_data(llr)
                llr_flat = llr_data.reshape(llr_data.shape[:2] + (-1,))
                labels = bits_list[li]
                # BCE with logits, llr = log(p1/p0)
                bce = (jax.nn.softplus(llr_flat)
                       - labels * llr_flat)
                m = (mcs_ue_mask[:, :, idx] * active_tx)[..., None]
                loss_data = loss_data + jnp.mean(bce * m)

        loss_chest = jnp.float32(0.0)
        if h_label is not None:
            for hh in h_hats:
                se = (h_label - hh) ** 2
                loss_chest = loss_chest + jnp.mean(
                    se * active_tx[:, :, None, None, None])
        return loss_data, loss_chest
