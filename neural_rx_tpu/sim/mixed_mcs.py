"""Mixed-MCS evaluation model (reference E2E_Model_Mixed_MCS,
utils/e2e_model.py:656-839 commented TF original).

Evaluates scenarios where different UEs run different MCS
simultaneously: a per-UE one-hot `mcs_ue_mask` schedules the MCS mix,
the receiver processes all MCSs, and bits / estimates / CRC status are
returned for ONE selected UE (scheduled with mcs_arr_eval_idx[0]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .e2e import E2EModel
from ..phy.misc import binary_source


class MixedMCSE2EModel(E2EModel):
    """E2E eval model returning a single UE's bits in a mixed-MCS mix."""

    def __init__(self, sys_parameters, mcs_arr_eval_idx, ue_return: int = 0,
                 mcs_ue_mask=None):
        super().__init__(sys_parameters, training=False)
        assert isinstance(mcs_arr_eval_idx, (list, tuple)), \
            "mixed-MCS needs the full MCS evaluation order as a list"
        assert len(mcs_arr_eval_idx) == self.num_mcs
        self.mcs_arr_eval = list(mcs_arr_eval_idx)
        self.ue_return = ue_return
        self._fixed_mask = mcs_ue_mask

    def __call__(self, params, key, batch_size: int, ebno_db,
                 num_tx=None, active_dmrs=None, mcs_arr_eval_idx=None,
                 mcs_ue_mask=None, apply_multiloss=False, num_it=None,
                 fast_ldpc: bool = False):
        p = self.p
        if mcs_ue_mask is None:
            mcs_ue_mask = self._fixed_mask
        if mcs_ue_mask is None:
            # default: UE i scheduled with mcs_arr_eval[i % num_mcs]
            sched = [self.mcs_arr_eval[i % self.num_mcs]
                     for i in range(p.max_num_tx)]
            mcs_ue_mask = jnp.tile(
                jax.nn.one_hot(jnp.asarray(sched), self.num_mcs)[None],
                (batch_size, 1, 1))

        keys = jax.random.split(key, 8)
        bits = []
        for i, idx in enumerate(self.mcs_arr_eval):
            bits.append(binary_source(
                jax.random.fold_in(keys[1], i),
                (batch_size, p.max_num_tx, self.transmitters[idx].tb_size)))

        x = None
        for i, idx in enumerate(self.mcs_arr_eval):
            pts = self._constellation_points(params, idx)
            x_i = self.transmitters[idx](bits[i],
                                         constellation_points=pts)
            m = mcs_ue_mask[:, :, idx].astype(jnp.complex64)
            x_i = x_i * m[:, :, None, None, None]
            x = x_i if x is None else x + x_i
        if active_dmrs is None:
            active_dmrs = jnp.ones((batch_size, p.max_num_tx))
        x = x * active_dmrs.astype(jnp.complex64)[:, :, None, None, None]

        if p.frequency_offset is not None:
            x = p.frequency_offset(keys[3], x)
        # rate-adjusted N0 follows the EVALUATED UE's MCS
        # (reference E2E_Model_Mixed_MCS uses transmitters[
        # mcs_arr_eval[0]] for the ebnodb2no conversion)
        no = self._noise_variance(ebno_db, self.mcs_arr_eval[0])
        y, h = self._channel(keys[4], batch_size, x, no)

        b_hat, _, _, crc = self.receiver.apply(
            params, y, active_dmrs, mcs_arr_eval=tuple(self.mcs_arr_eval),
            mcs_ue_mask=mcs_ue_mask, num_it=num_it, fast_ldpc=fast_ldpc)
        ue = self.ue_return
        return (bits[0][:, ue], b_hat[:, ue], crc[:, ue])


class MixedMCSBaselineModel(MixedMCSE2EModel):
    """Mixed-MCS classical receiver: LS/lin chest + per-RE LMMSE
    detection + per-UE demap at that UE's own MCS, returning one UE's
    bits (reference variable_mcs_nrx.ipynb mixed-MCS baseline: LMMSE
    detection operates per transmitter, so mixed MCS only changes the
    demapper constellation; K-Best is excluded there for the same
    reason it is here).
    """

    def __init__(self, sys_parameters, mcs_arr_eval_idx, ue_return: int = 0,
                 mcs_ue_mask=None, chest_type: str = "lslin"):
        super().__init__(sys_parameters, mcs_arr_eval_idx,
                         ue_return=ue_return, mcs_ue_mask=mcs_ue_mask)
        from ..phy.chest import LSChannelEstimator
        rg = self.transmitters[0].resource_grid
        self.rg_b = rg
        assert chest_type in ("lslin", "lsnn")
        self.ls = LSChannelEstimator(
            rg, "lin_extrap" if chest_type == "lslin" else "nn")

    def __call__(self, params, key, batch_size: int, ebno_db,
                 num_tx=None, active_dmrs=None, mcs_arr_eval_idx=None,
                 mcs_ue_mask=None, apply_multiloss=False, num_it=None,
                 fast_ldpc: bool = False):
        import numpy as np
        from ..phy.constellation import qam_points
        from ..phy.mapping import demap_maxlog
        from ..phy.nr.tb import tb_decode
        from ..rx.baselines import lmmse_equalize

        p = self.p
        if mcs_ue_mask is None:
            mcs_ue_mask = self._fixed_mask
        assert mcs_ue_mask is not None, "mixed baseline needs the mask"

        keys = jax.random.split(key, 8)
        bits = []
        for i, idx in enumerate(self.mcs_arr_eval):
            bits.append(binary_source(
                jax.random.fold_in(keys[1], i),
                (batch_size, p.max_num_tx,
                 self.transmitters[idx].tb_size)))
        x = None
        for i, idx in enumerate(self.mcs_arr_eval):
            x_i = self.transmitters[idx](bits[i])
            m = mcs_ue_mask[:, :, idx].astype(jnp.complex64)
            x_i = x_i * m[:, :, None, None, None]
            x = x_i if x is None else x + x_i

        if p.frequency_offset is not None:
            x = p.frequency_offset(keys[3], x)
        no = self._noise_variance(ebno_db, self.mcs_arr_eval[0])
        y, h = self._channel(keys[4], batch_size, x, no)

        h_hat, _ = self.ls(y, no)  # [b, ant, T, 14, sc]
        hh = jnp.transpose(h_hat, (0, 3, 4, 1, 2))  # [b,14,sc,ant,T]
        yy = jnp.transpose(y, (0, 2, 3, 1))
        x_hat, no_eff = lmmse_equalize(yy, hh, no)
        ue = self.ue_return
        ue_mcs = self.mcs_arr_eval[0]  # UE 0 is scheduled with this
        tx_ue = self.transmitters[ue_mcs]
        mbits = tx_ue.num_bits_per_symbol
        pts = jnp.asarray(qam_points(mbits))
        llr = demap_maxlog(x_hat[..., ue], pts, no_eff[..., ue])
        llr_data = self.rg_b.demap_data(llr)  # [b, n_data, mbits]
        llr_flat = llr_data.reshape(batch_size, -1)
        if fast_ldpc:
            from ..kernels.ldpc_pallas import tb_decode_fast as _decode
        else:
            _decode = tb_decode
        bh, ok = _decode(tx_ue.configs[ue].tb, llr_flat)
        return (bits[0][:, ue], bh, ok)
