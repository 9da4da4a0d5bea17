"""LS channel estimation + nearest-neighbor / linear interpolation.

First-party replacement for the reference's `MyLSChannelEstimatorNP`
(`utils/neural_rx.py:1129-1381`) and `NearestNeighborInterpolator`
(`:919-1081`), re-designed for TPU: the Manhattan-distance argmin gather
map is precomputed in NumPy at configuration time; on the hot path the
whole estimate is one gather + one divide, fully jittable and
shard-local (pilot comb indices are static).

Semantics match the reference:
- LS at pilot REs: h_ls = y / p where |p|>0, else 0 (safe divide,
  neural_rx.py:1289-1294).
- err_var = no / |p|^2 at pilot REs (neural_rx.py:1312-1315).
- NN interpolation: for every RE the nearest (Manhattan distance,
  zero-energy pilots excluded, first-index tie-break) pilot estimate is
  replicated (neural_rx.py:974-1000).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class LSChannelEstimator:
    """LS estimator over a static ResourceGrid.

    Estimates the per-UE *effective* (post-precoding) channel, one value
    per (rx antenna, tx) per RE, like the reference LS+NN path.
    """

    def __init__(self, resource_grid, interpolation_type: str = "nn",
                 slot_number: int | None = None,
                 focc_removal: bool = True):
        rg = resource_grid
        self.rg = rg
        # "lin_extrap" mirrors Sionna's LinearInterpolator exactly:
        # linear EXTRAPOLATION beyond the first/last pilot in both
        # frequency and time (slope of the nearest pilot pair, no
        # clipping). Plain "lin" clamps to the edge pilot value (flat
        # extension) — measurably more robust under noise+Doppler; the
        # delta between the two quantifies part of the +dB shift of our
        # lslin baseline vs the reference's committed curve (see
        # scripts/chest_ab.py and STATUS.md).
        self.extrapolate = interpolation_type == "lin_extrap"
        if self.extrapolate:
            interpolation_type = "lin"
        self.interpolation_type = interpolation_type
        slot = rg.configs[0].carrier.slot_number if slot_number is None \
            else slot_number

        mask = rg.pilot_mask  # [14, sc], same for all tx
        self._pilot_flat_ind = np.flatnonzero(mask.reshape(-1)).astype(
            np.int32)  # [n_pilots] row-major (symbol-major)
        # Per-TX pilot values in the same flat order. Pilot POSITIONS are
        # slot-independent; VALUES are not — the full per-slot bank is
        # kept so a (possibly traced) slot index can select the values
        # that were actually transmitted (training randomizes the DMRS
        # slot; the reference's estimator shares the transmitter's live
        # pilot object, reference neural_rx.py:1290-1291).
        self.pilot_bank = rg.pilots  # [num_slots, num_tx, n_pilots]
        self.pilots = rg.pilots[slot]  # default-slot values

        # Precompute per-TX NN gather indices [num_tx, 14, sc] -> pilot idx
        n_sym, n_sc = mask.shape
        i_p, j_p = np.where(mask)
        gather = np.zeros((rg.num_tx, n_sym, n_sc), np.int32)
        for tx in range(rg.num_tx):
            zero = np.abs(self.pilots[tx]) == 0
            # distance grid: [n_sym, n_sc, n_pilots]
            d = (np.abs(np.arange(n_sym)[:, None, None] - i_p[None, None, :])
                 + np.abs(np.arange(n_sc)[None, :, None] - j_p[None, None, :])
                 ).astype(np.int64)
            d[:, :, zero] = n_sym + n_sc  # max possible distance
            gather[tx] = np.argmin(d, axis=-1)
        self._gather_ind = gather

        # Safe reciprocal of pilots (0 where pilot is 0), full slot bank
        pb = self.pilot_bank
        self._pilot_inv_bank = np.where(
            np.abs(pb) > 0, 1.0 / np.where(np.abs(pb) > 0, pb, 1.0), 0.0
        ).astype(np.complex64)  # [num_slots, tx, n_pilots]
        self._pilot_inv = self._pilot_inv_bank[slot]
        p = self.pilots
        self._pilot_pow_inv = np.where(
            np.abs(p) > 0, 1.0 / np.maximum(np.abs(p) ** 2, 1e-12), 0.0
        ).astype(np.float32)  # |p| is slot-independent (QPSK * beta)
        self._default_slot = slot

        # FOCC despreading partner map: for DMRS with frequency-domain
        # OCC (config type 1: k' in {0,1} of the same group n; type 2:
        # the 2-SC cluster), average each pilot pair — Sionna's
        # PUSCHLSChannelEstimator despreads the same way (and the
        # reference's ONNX NRPreprocessing replicates it as
        # `_focc_removal`, neural_rx.py:1620-1629). Valid when at most
        # one port per CDM group is active (all reference configs).
        self.focc_removal = focc_removal
        if focc_removal:
            partner = np.zeros((rg.num_tx, self.pilots.shape[-1]),
                               np.int32)
            for tx in range(rg.num_tx):
                nz = np.where(np.abs(self.pilots[tx]) > 0)[0]
                part = np.arange(self.pilots.shape[-1], dtype=np.int32)
                # consecutive nonzero entries of this TX form OCC pairs
                part[nz[0::2]] = nz[1::2]
                part[nz[1::2]] = nz[0::2]
                partner[tx] = part
            self._focc_partner = partner

        self._dense_ok = False
        if self.interpolation_type == "nn":
            self._build_dense_nn()

    # -- dense (gather-free) NN fast path --------------------------------
    def _build_dense_nn(self):
        """Precompute tables for `estimate_planar_dense`, or record that
        the pilot pattern doesn't factorize (then the gather path stays).

        Valid when, per TX, the active pilots form a uniform comb-2
        pattern identical on every DMRS symbol (38.211 type-1 DMRS —
        every live reference config). Then the Manhattan-NN gather map
        factorizes into (nearest DMRS symbol in time) x (nearest active
        subcarrier in frequency), and the frequency step is a static
        1-lane shift: for comb offset d, an off-comb subcarrier s takes
        the value at s-1 (argmin first-index tie-break), except s=0 for
        d=1 which takes s+1. FOCC pair-averaging ((4n+d, 4n+2+d) pairs)
        is a static +/-2-lane shift with a parity mask. Zero gathers,
        zero narrow-trailing-dim layouts on the hot path (the round-3
        infer trace showed the gather+copy churn at ~25% of the slot).
        """
        self._dense_ok = False
        rg = self.rg
        mask = rg.pilot_mask
        n_sym, n_sc = mask.shape
        i_p, j_p = np.where(mask)
        dsyms = np.asarray(sorted(set(i_p.tolist())), np.int64)
        nds = len(dsyms)
        n_tx = rg.num_tx
        combs = np.zeros(n_tx, np.int64)
        for tx in range(n_tx):
            act = np.abs(self.pilots[tx]) > 0
            # active (sym, sc) pairs of this tx
            sc_per_sym = [np.sort(j_p[(i_p == s) & act]) for s in dsyms]
            sc0 = sc_per_sym[0]
            if any(len(s) != len(sc0) or (s != sc0).any()
                   for s in sc_per_sym[1:]):
                return
            if len(sc0) < 2:
                return
            d = int(sc0[0])
            if d not in (0, 1) or (np.diff(sc0) != 2).any() \
                    or len(sc0) != n_sc // 2 \
                    or (n_sc % 4) != 0:
                return
            combs[tx] = d
        if self.focc_removal:
            # verify the partner map is the (4n+d, 4n+2+d) pairing the
            # shift construction assumes
            for tx in range(n_tx):
                act = np.abs(self.pilots[tx]) > 0
                part = self._focc_partner[tx]
                for k in np.where(act)[0]:
                    sc_k, sc_p = j_p[k], j_p[part[k]]
                    if i_p[k] != i_p[part[k]]:
                        return
                    g = (sc_k - combs[tx]) // 2
                    want = sc_k + 2 if g % 2 == 0 else sc_k - 2
                    if sc_p != want:
                        return
        # nearest DMRS symbol per output symbol (first-index tie-break)
        dist = np.abs(np.arange(n_sym)[:, None] - dsyms[None, :])
        self._dense_sym_sel = np.argmin(dist, axis=1).astype(np.int32)
        self._dense_dsyms = dsyms
        self._dense_combs = combs
        # dense per-slot inverse-pilot grids [num_slots, tx, nds, sc]
        pb_inv = self._pilot_inv_bank  # [num_slots, tx, n_pilots]
        n_slots = pb_inv.shape[0]
        sym_pos = {int(s): k for k, s in enumerate(dsyms)}
        dense = np.zeros((n_slots, n_tx, nds, n_sc), np.complex64)
        dense[:, :, [sym_pos[int(s)] for s in i_p], j_p] = pb_inv
        self._dense_inv_r = np.ascontiguousarray(dense.real)
        self._dense_inv_i = np.ascontiguousarray(dense.imag)
        # static sc masks
        sc = np.arange(n_sc)
        self._dense_oncomb = np.stack(
            [(sc % 2) == combs[tx] for tx in range(n_tx)])  # [tx, sc]
        self._dense_geven = np.stack(
            [((sc - combs[tx]) // 2) % 2 == 0 for tx in range(n_tx)])
        self._dense_ok = True

    def estimate_planar_dense(self, y_planar: jnp.ndarray, slot_idx=None,
                              out_dtype=None) -> jnp.ndarray:
        """Gather-free NN LS estimate (see `_build_dense_nn`).

        Same contract and (bit-exact) result as `estimate_planar`:
        y_planar [b, ant, 14, sc, 2] real -> h_in [b, tx, 14, sc, 2*ant]
        with channel order [re a0.., im a0..].
        """
        assert self._dense_ok
        rg = self.rg
        b, ant = y_planar.shape[0], y_planar.shape[1]
        n_sym, n_sc = rg.pilot_mask.shape
        n_tx = rg.num_tx
        dsyms = jnp.asarray(self._dense_dsyms)
        # DMRS symbols only, sc stays minor: [b, ant, nds, sc]
        yr = jnp.take(y_planar[..., 0], dsyms, axis=2)
        yi = jnp.take(y_planar[..., 1], dsyms, axis=2)
        if slot_idx is None:
            invr = jnp.asarray(self._dense_inv_r[self._default_slot])
            invi = jnp.asarray(self._dense_inv_i[self._default_slot])
        else:
            invr = jnp.take(jnp.asarray(self._dense_inv_r), slot_idx,
                            axis=0)
            invi = jnp.take(jnp.asarray(self._dense_inv_i), slot_idx,
                            axis=0)
        # [b, ant, tx, nds, sc] planar complex multiply (dense, no take)
        hr = yr[:, :, None] * invr - yi[:, :, None] * invi
        hi = yr[:, :, None] * invi + yi[:, :, None] * invr
        if self.focc_removal:
            ge = jnp.asarray(self._dense_geven)[None, None, :, None, :]
            hr = 0.5 * (hr + jnp.where(ge, jnp.roll(hr, -2, axis=-1),
                                       jnp.roll(hr, 2, axis=-1)))
            hi = 0.5 * (hi + jnp.where(ge, jnp.roll(hi, -2, axis=-1),
                                       jnp.roll(hi, 2, axis=-1)))
        if out_dtype is not None:
            hr = hr.astype(out_dtype)
            hi = hi.astype(out_dtype)
        # frequency NN: off-comb sc takes the value one lane to the left
        oc = jnp.asarray(self._dense_oncomb)[None, None, :, None, :]
        hr = jnp.where(oc, hr, jnp.roll(hr, 1, axis=-1))
        hi = jnp.where(oc, hi, jnp.roll(hi, 1, axis=-1))
        if any(int(d) == 1 for d in self._dense_combs):
            # d=1: s=0 has no left pilot; NN is s=1 (wrap fix, static)
            fix = jnp.asarray(
                [1 if int(d) == 1 else 0 for d in self._dense_combs],
                jnp.int32)  # per-tx source sc for s=0
            src_r = jnp.take_along_axis(
                hr, fix[None, None, :, None, None], axis=-1)
            src_i = jnp.take_along_axis(
                hi, fix[None, None, :, None, None], axis=-1)
            first = (jnp.arange(n_sc) == 0)[None, None, None, None, :]
            hr = jnp.where(first, src_r, hr)
            hi = jnp.where(first, src_i, hi)
        # time NN: expand the nds DMRS rows to all 14 symbols
        sel = jnp.asarray(self._dense_sym_sel)
        hr = jnp.take(hr, sel, axis=3)  # [b, ant, tx, 14, sc]
        hi = jnp.take(hi, sel, axis=3)
        # one final transpose to the NRX h_in layout
        h = jnp.stack([hr, hi], axis=1)  # [b, 2, ant, tx, 14, sc]
        h = jnp.transpose(h, (0, 3, 4, 5, 1, 2))  # [b,tx,14,sc,2,ant]
        return h.reshape(b, n_tx, n_sym, n_sc, 2 * ant)

    def ls_at_pilots(self, y: jnp.ndarray, slot_idx=None) -> jnp.ndarray:
        """Raw LS estimates at pilot REs: y [b, ant, 14, sc] ->
        h_ls [b, ant, num_tx, n_pilots] (zeros on other-comb REs).

        slot_idx (possibly traced) selects which slot's DMRS values were
        transmitted; defaults to the configured slot.
        """
        b, n_ant = y.shape[0], y.shape[1]
        y_flat = y.reshape(b, n_ant, -1)
        y_p = y_flat[..., self._pilot_flat_ind]  # [b, ant, n_pilots]
        if slot_idx is None:
            inv = jnp.asarray(self._pilot_inv)
        else:
            inv = jnp.take(jnp.asarray(self._pilot_inv_bank),
                           slot_idx, axis=0)
        return y_p[:, :, None, :] * inv[None, None]

    def estimate_planar(self, y_planar: jnp.ndarray, slot_idx=None,
                        out_dtype=None) -> jnp.ndarray:
        """TPU fast path: planar in, channels-last out, no complex dtype.

        y_planar: [b, ant, 14, sc, 2] real (re/im last) ->
        h_in: [b, num_tx, 14, sc, 2*ant] real with channel order
        [re a0..aA, im a0..aA] — exactly the NRX h_in layout that
        `__call__` + re/im stacking produces, but avoiding the complex
        moveaxis/concat and the multi-index-dim gather (measured ~4x
        cheaper at the 132-PRB batch-1 operating point). nn
        interpolation only.
        """
        assert self.interpolation_type == "nn"
        b, ant = y_planar.shape[0], y_planar.shape[1]
        rg = self.rg
        n_tx = rg.num_tx
        n_sym, n_sc = rg.pilot_mask.shape
        # LS at pilots, planar complex multiply
        pf = jnp.asarray(self._pilot_flat_ind)
        yf = y_planar.reshape(b, ant, n_sym * n_sc, 2)
        y_p = jnp.take(yf, pf, axis=2)  # [b, ant, npil, 2]
        if slot_idx is None:
            inv = self._pilot_inv
            invr = jnp.asarray(inv.real.astype(np.float32))
            invi = jnp.asarray(inv.imag.astype(np.float32))
        else:
            bank_r = jnp.asarray(self._pilot_inv_bank.real.astype(
                np.float32))
            bank_i = jnp.asarray(self._pilot_inv_bank.imag.astype(
                np.float32))
            invr = jnp.take(bank_r, slot_idx, axis=0)
            invi = jnp.take(bank_i, slot_idx, axis=0)
        npil = y_p.shape[2]
        hr = y_p[..., None, :, 0] * invr - y_p[..., None, :, 1] * invi
        hi = y_p[..., None, :, 0] * invi + y_p[..., None, :, 1] * invr
        h_pil = jnp.stack([hr, hi], axis=-1)  # [b, ant, tx, npil, 2]
        if self.focc_removal:
            part = self._focc_partner  # [tx, npil] static
            flat_part = jnp.asarray(
                (np.arange(n_tx)[:, None] * npil + part).ravel())
            h2 = h_pil.reshape(b, ant, n_tx * npil, 2)
            h_part = jnp.take(h2, flat_part, axis=2).reshape(h_pil.shape)
            h_pil = 0.5 * (h_pil + h_part)
        # Round to the consumer dtype BEFORE the grid gather + layout
        # moves: the NRX casts h_in to its compute dtype anyway, and a
        # gather passes values through unchanged — doing it early halves
        # the f32 gather/transpose traffic (round-3 infer trace: the
        # full-grid interp gathers + copies were ~7% of the slot).
        if out_dtype is not None:
            h_pil = h_pil.astype(out_dtype)
        # channels-last BEFORE the grid interpolation (small transpose)
        h_pil = jnp.moveaxis(h_pil, 1, -1)          # [b, tx, npil, 2, ant]
        h_pil = h_pil.reshape(b, n_tx, npil, 2 * ant)
        h_pil = jnp.moveaxis(h_pil, 2, -1)          # [b, tx, 2ant, npil]
        # one static sc-trailing take per TX over the whole grid
        gi = self._gather_ind  # [tx, 14, sc], values in [0, npil)
        outs = [jnp.take(h_pil[:, t], jnp.asarray(gi[t].reshape(-1)),
                         axis=-1)
                for t in range(n_tx)]
        h_grid = jnp.stack(outs, axis=1)            # [b, tx, 2ant, 14*sc]
        h_grid = jnp.moveaxis(h_grid, 2, -1)
        return h_grid.reshape(b, n_tx, n_sym, n_sc, 2 * ant)

    def __call__(self, y: jnp.ndarray, no, slot_idx=None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """y: [batch, num_rx_ant, 14, sc] -> (h_hat, err_var).

        h_hat: [batch, num_rx_ant, num_tx, 14, sc] complex — per-UE
        effective channel estimate over the full grid.
        err_var: same shape, float.
        """
        rg = self.rg
        b, n_ant = y.shape[0], y.shape[1]
        h_ls = self.ls_at_pilots(y, slot_idx)  # [b, ant, tx, n_pilots]
        ev = jnp.asarray(no, jnp.float32) * jnp.ones((b, n_ant, 1, 1))
        ev = ev * jnp.asarray(self._pilot_pow_inv)[None, None]
        if self.focc_removal:
            part = jnp.asarray(self._focc_partner)  # [tx, n_pilots]
            h_part = h_ls[:, :, jnp.arange(rg.num_tx)[:, None], part]
            h_ls = 0.5 * (h_ls + h_part)
            ev = 0.5 * ev  # averaging halves the estimation noise

        if self.interpolation_type == "nn":
            gi = jnp.asarray(self._gather_ind)  # [tx, 14, sc]
            # per-tx gather over the pilot axis: h[b, ant, tx, 14, sc]
            h_hat = h_ls[:, :, jnp.arange(rg.num_tx)[:, None, None], gi]
            err_var = ev[:, :, jnp.arange(rg.num_tx)[:, None, None], gi]
            return h_hat, err_var
        if self.interpolation_type == "lin":
            return self._interpolate_linear(h_ls, ev)
        raise ValueError(f"unknown interpolation {self.interpolation_type}")

    # -- linear interpolation over frequency, nearest over time ---------
    def _interpolate_linear(self, h_ls, ev):
        """Linear interpolation in frequency per DMRS symbol, then
        nearest/linear in time (reference "lslin" baseline analog)."""
        rg = self.rg
        mask = rg.pilot_mask
        n_sym, n_sc = mask.shape
        dmrs_syms = sorted(set(np.where(mask.any(axis=1))[0].tolist()))
        outs = []
        for tx in range(rg.num_tx):
            nz = np.abs(self.pilots[tx]) > 0
            i_p, j_p = np.where(mask)
            h_tx = h_ls[:, :, tx]  # [b, ant, n_pilots]
            per_sym = []
            for s in dmrs_syms:
                sel = (i_p == s) & nz
                idx = np.where(sel)[0]
                scs = j_p[sel]
                # linear interp across subcarriers (static index arithmetic)
                xi = np.arange(n_sc, dtype=np.float32)
                # for each target sc find left/right pilot neighbors
                if self.extrapolate:
                    # slope of the nearest pilot pair continues past the
                    # edges (Sionna LinearInterpolator semantics)
                    left = np.clip(np.searchsorted(scs, xi, "right") - 1,
                                   0, max(len(scs) - 2, 0))
                    right = np.clip(left + 1, 0, len(scs) - 1)
                    x0, x1 = scs[left], scs[right]
                    w1 = np.where(x1 > x0,
                                  (xi - x0) / np.maximum(x1 - x0, 1), 0.)
                    w1 = w1.astype(np.float32)
                else:
                    left = np.clip(np.searchsorted(scs, xi, "right") - 1,
                                   0, len(scs) - 1)
                    right = np.clip(left + 1, 0, len(scs) - 1)
                    x0, x1 = scs[left], scs[right]
                    w1 = np.where(x1 > x0,
                                  (xi - x0) / np.maximum(x1 - x0, 1), 0.)
                    w1 = np.clip(w1, 0.0, 1.0).astype(np.float32)
                h0 = h_tx[..., idx[left]]
                h1 = h_tx[..., idx[right]]
                per_sym.append(h0 + (h1 - h0) * jnp.asarray(w1))
            # time: piecewise-linear between DMRS symbols; edges are flat
            # ("lin") or slope-extrapolated ("lin_extrap", Sionna)
            t = np.asarray(dmrs_syms, np.float32)
            ti = np.arange(n_sym, dtype=np.float32)
            if self.extrapolate and len(t) > 1:
                lt = np.clip(np.searchsorted(t, ti, "right") - 1,
                             0, len(t) - 2)
                rt = np.clip(lt + 1, 0, len(t) - 1)
                t0, t1 = t[lt], t[rt]
                wt = np.where(t1 > t0,
                              (ti - t0) / np.maximum(t1 - t0, 1), 0.)
                wt = wt.astype(np.float32)
            else:
                lt = np.clip(np.searchsorted(t, ti, "right") - 1,
                             0, len(t) - 1)
                rt = np.clip(lt + 1, 0, len(t) - 1)
                t0, t1 = t[lt], t[rt]
                wt = np.where(t1 > t0,
                              (ti - t0) / np.maximum(t1 - t0, 1), 0.)
                wt = np.clip(wt, 0.0, 1.0).astype(np.float32)
            hs = jnp.stack(per_sym, axis=-2)  # [b, ant, n_dmrs_syms, sc]
            h0 = hs[..., lt, :]
            h1 = hs[..., rt, :]
            outs.append(h0 + (h1 - h0) * jnp.asarray(wt)[:, None])
        h_hat = jnp.stack(outs, axis=2)  # [b, ant, tx, 14, sc]
        gi = jnp.asarray(self._gather_ind)
        err_var = ev[:, :, jnp.arange(rg.num_tx)[:, None, None], gi]
        return h_hat, err_var
