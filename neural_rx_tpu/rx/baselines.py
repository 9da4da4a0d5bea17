"""Classical baseline receivers: LMMSE detection, K-Best detection,
LS/LMMSE channel estimation variants, perfect CSI.

TPU-native replacement for reference `utils/baseline_rx.py` (Sionna
PUSCHReceiver assemblies, SURVEY.md §2.3):

- `lmmse_equalize`: per-RE MMSE equalization with unit-power symbol
  prior; returns Sionna-convention unbiased estimates x_hat = x + e and
  per-stream effective noise variances (vendored reference
  siona_tf.py:3893-4114). Per-RE matrices are tiny (ant x streams);
  batched einsum solves map well onto the MXU.
- `kbest_detect`: K-Best sphere-ish tree search (QR + per-level expand /
  top-k prune, K=64 like baseline_rx.py:242-254) with max-log LLRs from
  the candidate list; static shapes (top_k over a fixed candidate set).
- `LMMSEChannelInterpolator`: space-freq-time LMMSE interpolation from
  measured covariance matrices with the reference's PRB-chunked
  low-complexity variant for large bandwidths (baseline_rx.py:310-486).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..phy.constellation import qam_points, bit_labels


# ---------------------------------------------------------------------------
# LMMSE detection
# ---------------------------------------------------------------------------

def lmmse_equalize(y, h, no):
    """Per-RE LMMSE equalization.

    y: [..., ant]; h: [..., ant, streams]; no: noise variance (scalar or
    broadcastable to [...]).
    Returns (x_hat [..., streams], no_eff [..., streams]) with the
    unbiased convention x_hat = x + e, Var(e) = no_eff.
    """
    no = jnp.asarray(no, jnp.float32)
    hh = jnp.einsum("...as,...at->...st", jnp.conj(h), h)
    eye = jnp.eye(hh.shape[-1], dtype=hh.dtype)
    a = hh + no[..., None, None] * eye
    hy = jnp.einsum("...as,...a->...s", jnp.conj(h), y)
    x_tilde = jnp.linalg.solve(a, hy[..., None])[..., 0]
    # bias mu_s = [A^-1 H^H H]_ss
    ainv_hh = jnp.linalg.solve(a, hh)
    mu = jnp.real(jnp.diagonal(ainv_hh, axis1=-2, axis2=-1))
    mu = jnp.clip(mu, 1e-6, 1.0 - 1e-6)
    x_hat = x_tilde / mu
    no_eff = (1.0 - mu) / mu
    return x_hat, no_eff


# ---------------------------------------------------------------------------
# K-Best detection
# ---------------------------------------------------------------------------

def _qr_small(h, max_unrolled: int = 4):
    """Batched thin QR for few-stream MIMO channels.

    XLA's generic `jnp.linalg.qr` lowers to Householder loops that
    serialize badly on TPU for huge batches of tiny matrices; modified
    Gram-Schmidt unrolled over the (static, small) stream count is pure
    batched einsum/VPU work. Any valid QR gives identical K-Best
    detection (only A = QR with orthonormal Q is required), so the
    convention difference vs linalg.qr is irrelevant.
    """
    s = h.shape[-1]
    if s > max_unrolled:
        return jnp.linalg.qr(h)
    qs, rows = [], []
    for j in range(s):
        v = h[..., :, j]
        rj = []
        for i in range(j):
            rij = jnp.sum(jnp.conj(qs[i]) * v, axis=-1)
            v = v - rij[..., None] * qs[i]
            rj.append(rij)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=-1))
        safe = jnp.maximum(nrm, 1e-20)
        qs.append(v / safe[..., None].astype(v.dtype))
        rj.append(nrm.astype(h.dtype))
        rj += [jnp.zeros_like(nrm).astype(h.dtype)] * (s - j - 1)
        rows.append(jnp.stack(rj, axis=-1))  # row j? (see stack below)
    q = jnp.stack(qs, axis=-1)  # [..., ant, S]
    # rows[j][..., i] currently holds r[i, j] for i<=j -> stack as cols
    r = jnp.stack(rows, axis=-1)  # [..., i, j]
    return q, r


def _ml_maxlog_detect(y, h, no, points, labels, n_streams, llr_clip):
    """Exact max-log detection over the full candidate cross-product
    (1 or 2 streams). y: [..., ant]; h: [..., ant, S] -> [..., S, m].

    Constant-per-RE |y|^2 terms cancel in LLR differences, so the
    metric is -2 Re<z, c> + c^H G c with z = H^H y, G = H^H H. For 2
    streams the n_pts^2 candidates are swept by a lax.scan over the
    stream-0 symbol carrying running per-bit maxima and a per-c1 best
    row — O(REs * n_pts) memory instead of materializing the
    [REs, n_pts^2, ant] cross-product (which would be ~8 GB at the
    132-PRB eval shape).
    """
    n_pts = points.shape[0]
    m = labels.shape[-1]
    no = jnp.maximum(jnp.asarray(no, jnp.float32), 1e-12)
    big = jnp.asarray(1e9, jnp.float32)

    if n_streams == 1:
        # d(c) - |y|^2 = -2 Re(y^H h c) + |h|^2 |c|^2
        z = jnp.einsum("...a,...as->...s", jnp.conj(y), h)[..., 0]
        g = jnp.sum(jnp.abs(h[..., 0]) ** 2, axis=-1)
        d = (-2.0 * (z[..., None] * points).real
             + g[..., None] * (jnp.abs(points) ** 2))
        met = -d / no[..., None]
        b_t = labels.T[(None,) * (met.ndim - 1)]
        m1 = jnp.max(jnp.where(b_t > 0.5, met[..., None, :], -big), -1)
        m0 = jnp.max(jnp.where(b_t < 0.5, met[..., None, :], -big), -1)
        return jnp.clip(m1 - m0, -llr_clip, llr_clip)[..., None, :]

    assert n_streams == 2
    z = jnp.einsum("...as,...a->...s", jnp.conj(h), y)  # [..., 2]
    gram = jnp.einsum("...as,...at->...st", jnp.conj(h), h)  # [..., 2, 2]
    g00 = gram[..., 0, 0].real
    g11 = gram[..., 1, 1].real
    g01 = gram[..., 0, 1]  # h0^H h1
    p_abs2 = jnp.abs(points) ** 2  # [P]

    # terms independent of c0: [..., P] over c1
    v1 = (g11[..., None] * p_abs2
          - 2.0 * (jnp.conj(z[..., 1:2]) * points).real)

    bits_f = labels  # [P, m] float

    def step(carry, s0):
        m1_0, m0_0, best1 = carry
        c0 = points[s0]
        a0 = (g00 * jnp.abs(c0) ** 2
              - 2.0 * (jnp.conj(z[..., 0]) * c0).real)  # [...]
        cross = 2.0 * (g01[..., None] * jnp.conj(c0)
                       * points).real  # [..., P]
        d = a0[..., None] + v1 + cross  # [..., P] over c1
        met = -d / no[..., None]
        # per-c1 best over all s0 (for stream-1 LLRs)
        best1 = jnp.maximum(best1, met)
        # stream-0 bit maxima: best over c1 for this s0
        mbest = jnp.max(met, axis=-1)  # [...]
        b0 = bits_f[s0]  # [m]
        upd1 = jnp.where(b0[(None,) * mbest.ndim] > 0.5,
                         mbest[..., None], -big)
        upd0 = jnp.where(b0[(None,) * mbest.ndim] < 0.5,
                         mbest[..., None], -big)
        return (jnp.maximum(m1_0, upd1), jnp.maximum(m0_0, upd0),
                best1), None

    shape = y.shape[:-1]
    init = (jnp.full(shape + (m,), -big), jnp.full(shape + (m,), -big),
            jnp.full(shape + (n_pts,), -big))
    (m1_0, m0_0, best1), _ = jax.lax.scan(step, init,
                                          jnp.arange(n_pts))
    llr0 = jnp.clip(m1_0 - m0_0, -llr_clip, llr_clip)
    b_t = labels.T[(None,) * (best1.ndim - 1)]  # [..., m, P]
    m1_1 = jnp.max(jnp.where(b_t > 0.5, best1[..., None, :], -big), -1)
    m0_1 = jnp.max(jnp.where(b_t < 0.5, best1[..., None, :], -big), -1)
    llr1 = jnp.clip(m1_1 - m0_1, -llr_clip, llr_clip)
    return jnp.stack([llr0, llr1], axis=-2)  # [..., 2, m]


def kbest_detect(y, h, no, num_bits_per_symbol: int, k: int = 64,
                 llr_clip: float = 20.0, exact: bool | None = None):
    """K-Best MIMO detection with max-log LLRs from the survivor list.

    y: [..., ant]; h: [..., ant, streams]; returns llr
    [..., streams, num_bits_per_symbol] in log(p1/p0) convention.

    Follows Sionna's KBestDetector semantics (reference
    baseline_rx.py:242-254, k=64): QR decomposition, detection from the
    last stream up, expand every survivor with all constellation points,
    keep the k best partial Euclidean distances. Bits lacking a
    counter-hypothesis in the final list get +/- llr_clip.

    exact: None (default) auto-selects the EXACT max-log over the full
    candidate set for small search spaces (n_pts**n_streams <= 4096,
    i.e. any <=2-stream case up to 64-QAM — a strictly stronger
    detector than the k-survivor list, and the one every "K-Best"
    baseline row in results/compare is measured with for those cases;
    stated there); True forces it (only valid for <=2 streams);
    False forces the k-survivor list recursion. Rationale for the
    default: the 64-survivor list starves 64-QAM bit LLRs of
    counter-hypotheses (measured round 4: coded BLER 0.083 vs 0.000
    exact at 11 dB on 2x4 Rayleigh; the committed-curve gap vs the
    reference's detector was +1.0 dB while the hard decisions already
    matched exhaustive ML) — and the full candidate cross-product is
    one MXU-friendly batched matmul, cheaper on TPU than the
    sort-heavy list recursion it replaces.
    """
    points = jnp.asarray(qam_points(num_bits_per_symbol))
    labels = jnp.asarray(bit_labels(num_bits_per_symbol))  # [P, m]
    n_pts = points.shape[0]
    n_streams = h.shape[-1]

    if exact is None:
        exact = n_streams <= 2 and n_pts <= 64
    if exact:
        assert n_streams <= 2, "exact max-log supports <=2 streams"
        return _ml_maxlog_detect(y, h, no, points, labels, n_streams,
                                 llr_clip)

    # sorted detection order (standard K-Best / SQRD): permute columns
    # so the STRONGEST stream sits last and is detected at the root
    # level, minimizing error propagation through the prunes. Matters
    # most where pruning is harshest (2 streams of 64-QAM keep 64 of
    # 4096 at level 1: the round-4 unordered detector measured +1.76 dB
    # vs the reference's Sionna K-Best on that exact curve).
    order = None
    if n_streams > 1:
        norms = jnp.sum(jnp.abs(h) ** 2, axis=-2)  # [..., S]
        order = jnp.argsort(norms, axis=-1)  # ascending: strongest last
        h = jnp.take_along_axis(h, order[..., None, :], axis=-1)

    q, r = _qr_small(h)  # q: [..., ant, S], r: [..., S, S]
    z = jnp.einsum("...as,...a->...s", jnp.conj(q), y)

    # level 0: last stream
    s_idx = n_streams - 1
    ped = jnp.abs(z[..., s_idx:s_idx + 1]
                  - r[..., s_idx, s_idx][..., None] * points) ** 2
    # candidate symbol indices per level: [..., cand, level]
    cand_idx = jnp.broadcast_to(
        jnp.arange(n_pts), ped.shape)[..., None]  # [..., P, 1]
    k_lvl = min(k, n_pts)
    ped, top = jax.lax.top_k(-ped, k_lvl)
    ped = -ped
    cand_idx = jnp.take_along_axis(cand_idx, top[..., None], axis=-2)

    for lvl in range(1, n_streams):
        s = n_streams - 1 - lvl
        n_cand = cand_idx.shape[-2]
        # interference from already-detected streams
        interf = jnp.zeros(ped.shape, jnp.complex64)
        for j in range(lvl):
            sj = n_streams - 1 - j
            interf = interf + (r[..., s, sj][..., None]
                               * points[cand_idx[..., j]])
        resid = z[..., s][..., None] - interf  # [..., cand]
        # expand: [..., cand, P]
        ped_new = ped[..., None] + jnp.abs(
            resid[..., None] - r[..., s, s][..., None, None] * points) ** 2
        ped_flat = ped_new.reshape(ped_new.shape[:-2] + (n_cand * n_pts,))
        new_sym = jnp.broadcast_to(
            jnp.arange(n_pts), ped_new.shape).reshape(ped_flat.shape)
        parent = jnp.broadcast_to(
            jnp.arange(n_cand)[:, None], ped_new.shape[-2:]
        ).reshape(-1)
        parent = jnp.broadcast_to(parent, ped_flat.shape)
        k_lvl = min(k, ped_flat.shape[-1])
        negped, top = jax.lax.top_k(-ped_flat, k_lvl)
        ped = -negped
        new_sym = jnp.take_along_axis(new_sym, top, axis=-1)
        parent = jnp.take_along_axis(parent, top, axis=-1)
        cand_idx = jnp.take_along_axis(
            cand_idx, parent[..., None], axis=-2)
        cand_idx = jnp.concatenate([cand_idx, new_sym[..., None]], axis=-1)

    # cand_idx[..., cand, lvl] holds symbol index of stream (S-1-lvl)
    # max-log LLRs per stream/bit from the survivor list
    no = jnp.maximum(jnp.asarray(no, jnp.float32), 1e-12)
    metric = -ped / no[..., None]  # [..., cand] log-likelihood scale
    llrs = []
    big = jnp.asarray(1e9, jnp.float32)
    for st in range(n_streams):
        lvl = n_streams - 1 - st
        sym = cand_idx[..., lvl]  # [..., cand]
        bits = labels[sym]  # [..., cand, m]
        m1 = jnp.where(bits > 0.5, metric[..., None], -big)
        m0 = jnp.where(bits < 0.5, metric[..., None], -big)
        llr = jnp.max(m1, axis=-2) - jnp.max(m0, axis=-2)
        llrs.append(jnp.clip(llr, -llr_clip, llr_clip))
    out = jnp.stack(llrs, axis=-2)  # [..., streams(permuted), m]
    if order is not None:
        # undo the detection-order permutation: out[perm_pos] belongs
        # to original stream order[perm_pos]
        inv = jnp.argsort(order, axis=-1)
        out = jnp.take_along_axis(out, inv[..., :, None], axis=-2)
    return out


# ---------------------------------------------------------------------------
# LMMSE channel interpolation from measured covariances
# ---------------------------------------------------------------------------

def _lmmse_weights(cov: np.ndarray, obs_idx: np.ndarray,
                   noise_var: float) -> np.ndarray:
    """W = R[:, obs] (R[obs, obs] + noise I)^-1 : [N, n_obs]."""
    r_oo = cov[np.ix_(obs_idx, obs_idx)]
    r_ao = cov[:, obs_idx]
    a = r_oo + noise_var * np.eye(len(obs_idx))
    return r_ao @ np.linalg.inv(a)


def _best_chunk_size(n_prb: int, target: int = 20) -> int:
    """Reference heuristic (baseline_rx.py:114-137): smallest divisor of
    n_prb that is >= target PRBs (fallback: n_prb)."""
    for d in range(target, n_prb + 1):
        if n_prb % d == 0:
            return d
    return n_prb


class LMMSEChannelInterpolator:
    """Space-freq-time LMMSE interpolation (order "s-f-t") from measured
    covariance matrices.

    Two modes:
    - exact (default, lmmse_num_prbs == -1): FULL-band frequency LMMSE
      with the interpolation weights SOLVED ON DEVICE per call from the
      caller's actual noise variance — the semantics of the reference's
      Sionna `LMMSEInterpolator` baseline chain (baseline_rx.py:168-207:
      full-bandwidth weights, regularized per-eval). One [P, P] complex
      solve per stage per call; batch-independent, eval-only cost.
    - chunked (explicit lmmse_num_prbs > 0): PRB-chunked low-complexity
      variant with precomputed per-noise-bank weights (reference
      LowComplexityPUSCHLMSEEstimator, baseline_rx.py:310-486 — the
      Aerial-deployable fixed-chunk form). Round 4 measured the chunk
      boundaries costing ~+0.8 dB at 64-QAM BLER 1e-2 vs the exact
      mode, which is why exact is the eval default.
    """

    # pilot-level noise grid for the precomputed weight banks (chunked
    # mode): LMMSE weights built for one fixed noise level over-smooth
    # at high SNR (measured round 4: a fixed 0.1 put an error floor
    # under the 64-QAM LMMSE+K-Best curve, +1.7 dB vs the reference
    # whose interpolator is regularized per-eval); the caller's actual
    # no selects the nearest bank at trace time.
    NOISE_GRID = (0.8, 0.5, 0.32, 0.2, 0.125, 0.08, 0.05, 0.032, 0.02,
                  0.0125, 0.008, 0.005)

    def __init__(self, resource_grid, cov_freq: np.ndarray,
                 cov_time: np.ndarray, cov_space: np.ndarray,
                 noise_var_est: float = 0.1, lmmse_num_prbs: int = -1):
        rg = resource_grid
        self.rg = rg
        n_sc = rg.num_subcarriers
        n_prb = n_sc // 12
        mask = rg.pilot_mask
        self.dmrs_syms = np.where(mask.any(axis=1))[0]
        self._default_noise = noise_var_est

        self.exact = lmmse_num_prbs == -1
        if self.exact:
            chunk_prbs = n_prb  # full band
        elif lmmse_num_prbs == 0:
            # auto chunk size, reference low-complexity heuristic
            chunk_prbs = _best_chunk_size(n_prb) if n_prb > 100 else n_prb
        else:
            chunk_prbs = lmmse_num_prbs
        self.chunk_sc = chunk_prbs * 12
        self.num_chunks = n_sc // self.chunk_sc

        cf = cov_freq[:self.chunk_sc, :self.chunk_sc]
        slot = rg.configs[0].carrier.slot_number
        # mean pilot power (beta^2): converts symbol-level no to the
        # LS-at-pilot noise level the weights must regularize against
        pil = rg.pilots[slot]
        self._pilot_pow = float(np.mean(np.abs(pil[np.abs(pil) > 0]) ** 2))

        self._pilot_sc = {}
        for tx in range(rg.num_tx):
            nz = np.abs(rg.dmrs_grids[slot, tx, self.dmrs_syms[0]]) > 1e-3
            self._pilot_sc[tx] = np.where(nz)[0]

        if self.exact:
            # keep host-side covariance blocks; the per-call solve with
            # the ACTUAL noise builds the weights on device (complex
            # tables stay numpy — see verify skill: eager complex device
            # constants are an axon hazard, baked numpy constants fine)
            self._cf_oo = {}
            self._cf_ao = {}
            for tx in range(rg.num_tx):
                obs = self._pilot_sc[tx]
                self._cf_oo[tx] = cov_freq[np.ix_(obs, obs)].astype(
                    np.complex64)
                self._cf_ao[tx] = cov_freq[:, obs].astype(np.complex64)
            self._ct_oo = cov_time[np.ix_(self.dmrs_syms,
                                          self.dmrs_syms)].astype(
                np.complex64)
            self._ct_ao = cov_time[:, self.dmrs_syms].astype(np.complex64)
            self._cs = cov_space.astype(np.complex64)
            return

        grid = list(self.NOISE_GRID)
        self._noise_grid = np.asarray(grid, np.float32)
        self._wf = {}
        for tx in range(rg.num_tx):
            nz = np.abs(rg.dmrs_grids[slot, tx, self.dmrs_syms[0]]) > 1e-3
            sc_idx = np.where(nz[:self.chunk_sc])[0]
            self._wf[tx] = np.stack(
                [_lmmse_weights(cf, sc_idx, nv) for nv in grid]
            ).astype(np.complex64)  # [L, chunk_sc, pilots_in_chunk]
        self._wt = np.stack(
            [_lmmse_weights(cov_time, self.dmrs_syms, nv) for nv in grid]
        ).astype(np.complex64)  # [L, 14, n_dmrs]
        n_ant = cov_space.shape[0]
        self._ws = np.stack(
            [(cov_space @ np.linalg.inv(cov_space + nv * np.eye(n_ant)))
             for nv in grid]).astype(np.complex64)  # [L, ant, ant]

    def __call__(self, h_pilots: dict, no=None):
        """h_pilots: per tx -> [b, ant, n_dmrs_syms, n_pilot_sc] LS
        estimates at nonzero pilot REs. no: symbol-level noise variance
        (scalar, may be traced) selecting the nearest precomputed
        weight bank; None falls back to the construction-time
        noise_var_est, which is ALSO mapped to the nearest grid bank
        after pilot-power conversion (e.g. the default 0.1 lands on the
        0.125 or 0.08 bank depending on pilot power — there is no
        exact-0.1 bank).
        Returns [b, ant, tx, 14, sc]."""
        rg = self.rg
        if no is None:
            no = self._default_noise
        no_pil = jnp.asarray(no, jnp.float32) / self._pilot_pow
        if self.exact:
            return self._call_exact(h_pilots, no_pil)
        idx = jnp.argmin(jnp.abs(
            jnp.log(jnp.maximum(no_pil, 1e-9))
            - jnp.log(jnp.asarray(self._noise_grid))))
        ws = jnp.take(jnp.asarray(self._ws), idx, axis=0)
        wt = jnp.take(jnp.asarray(self._wt), idx, axis=0)
        outs = []
        for tx in range(rg.num_tx):
            hp = h_pilots[tx]
            # space smoothing
            hp = jnp.einsum("ij,bjts->bits", ws, hp)
            # frequency LMMSE per chunk
            b, ant, nt, nps = hp.shape
            per_chunk = nps // self.num_chunks
            hp_c = hp.reshape(b, ant, nt, self.num_chunks, per_chunk)
            wf = jnp.take(jnp.asarray(self._wf[tx]), idx, axis=0)
            hf = jnp.einsum("fp,batcp->batcf", wf, hp_c)
            hf = hf.reshape(b, ant, nt, -1)  # [b, ant, n_dmrs, sc]
            # time interpolation
            ht = jnp.einsum("st,batf->basf", wt, hf)
            outs.append(ht)
        return jnp.stack(outs, axis=2)  # [b, ant, tx, 14, sc]

    def _call_exact(self, h_pilots: dict, no_pil):
        """Full-band s-f-t LMMSE with weights solved per call at the
        actual noise level (reference Sionna LMMSEInterpolator
        semantics). `a @ W^T = r_ao^T` is solved on device; a is
        Hermitian PSD + nv*I so the generic LU solve is well posed."""
        no_c = no_pil.astype(jnp.complex64)

        def solve_w(r_oo, r_ao):
            a = jnp.asarray(r_oo) + no_c * jnp.eye(r_oo.shape[0],
                                                   dtype=jnp.complex64)
            return jnp.linalg.solve(a.T, jnp.asarray(r_ao).T).T

        wt = solve_w(self._ct_oo, self._ct_ao)  # [14, n_dmrs]
        n_ant = self._cs.shape[0]
        ws = solve_w(self._cs, self._cs)  # [ant, ant]
        outs = []
        for tx in range(self.rg.num_tx):
            wf = solve_w(self._cf_oo[tx], self._cf_ao[tx])  # [sc, P]
            hp = h_pilots[tx]  # [b, ant, n_dmrs, P]
            hp = jnp.einsum("ij,bjts->bits", ws, hp)
            hf = jnp.einsum("fp,batp->batf", wf, hp)  # [b, ant, nd, sc]
            ht = jnp.einsum("st,batf->basf", wt, hf)  # [b, ant, 14, sc]
            outs.append(ht)
        return jnp.stack(outs, axis=2)  # [b, ant, tx, 14, sc]
