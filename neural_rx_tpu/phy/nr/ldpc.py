"""5G NR QC-LDPC encoder and belief-propagation decoder (38.212 §5.3.2).

TPU-native design (replaces Sionna's LDPC5GEncoder/LDPC5GDecoder used by
the reference's TBEncoder/TBDecoder, SURVEY.md §2.9):

- Encoding uses the structured spec algorithm: per-row accumulation of
  Z-block circular shifts (static `jnp.roll`s, fully unrolled at trace
  time — XLA fuses them into gathers), the special-column trick to solve
  p1, staircase back-substitution for p2..p4, then direct computation of
  the degree-1 extension parities. GF(2) adds are float XORs
  ((a + b) mod 2) so everything stays on the VPU.

- Decoding is flat-edge BP over the lifted graph with a static edge list:
  per-edge frame changes are a single `take_along_axis` gather with a
  precomputed [E, Z] index map, and the per-row / per-column reductions
  are one-hot matmuls (E×R / E×C constants) that run on the MXU. Check
  update supports "boxplus" (phi-function, reference default
  `cn_type='boxplus'`, 20 iterations, nrx_rt.cfg:47-48) and "minsum".

LLR convention at the public boundary matches Sionna/the reference:
llr = log(p1/p0). Internally the decoder uses log(p0/p1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ldpc_tables import BG_PARAMS, SPECIAL_ROWS, base_graph


class LDPCCode:
    """Static description of one lifted code (bg, z) + precomputed indices."""

    def __init__(self, bg: int, z: int):
        self.bg = bg
        self.z = z
        p = BG_PARAMS[bg]
        self.k_b = p["k_b"]
        self.num_rows = p["num_rows"]
        self.num_cols = p["num_cols"]
        self.k = self.k_b * z  # systematic bits (incl. filler)
        self.n_full = self.num_cols * z  # incl. punctured 2Z
        self.n = self.n_full - 2 * z  # circular buffer size (66Z / 50Z)
        rows, shifts = base_graph(bg, z)
        self.rows = rows
        self.shifts = shifts
        # Flat edge list
        er, ec, es = [], [], []
        for r, cols in enumerate(rows):
            for c in cols:
                er.append(r)
                ec.append(c)
                es.append(shifts[(r, c)])
        self.edge_row = np.asarray(er, np.int32)
        self.edge_col = np.asarray(ec, np.int32)
        self.edge_shift = np.asarray(es, np.int32)
        self.num_edges = len(er)
        # Gather maps for frame changes: check frame sees var (i+s) mod Z.
        ar = np.arange(z)
        self.to_check_idx = (ar[None, :] + self.edge_shift[:, None]) % z
        self.to_var_idx = (ar[None, :] - self.edge_shift[:, None]) % z
        # One-hot segment-sum matrices (float32; tiny).
        self.row_onehot = np.zeros((self.num_edges, self.num_rows), np.float32)
        self.row_onehot[np.arange(self.num_edges), self.edge_row] = 1.0
        self.col_onehot = np.zeros((self.num_edges, self.num_cols), np.float32)
        self.col_onehot[np.arange(self.num_edges), self.edge_col] = 1.0
        # Padded per-row edge table (for min-sum): row_edges[r, d] = flat
        # edge index of the d-th edge of row r (0-padded, masked), plus the
        # inverse map flat-edge -> (row, slot) flattened for scatter-back.
        max_deg = max(len(r) for r in rows)
        self.max_row_deg = max_deg
        self.row_edges = np.zeros((self.num_rows, max_deg), np.int32)
        self.row_edge_mask = np.zeros((self.num_rows, max_deg), bool)
        self.row_edge_inv = np.zeros(self.num_edges, np.int32)
        slot_count = np.zeros(self.num_rows, np.int32)
        for e in range(self.num_edges):
            r = self.edge_row[e]
            d = slot_count[r]
            self.row_edges[r, d] = e
            self.row_edge_mask[r, d] = True
            self.row_edge_inv[e] = r * max_deg + d
            slot_count[r] += 1


@functools.lru_cache(maxsize=16)
def get_code(bg: int, z: int) -> LDPCCode:
    return LDPCCode(bg, z)


def _xor(a, b):
    return jnp.mod(a + b, 2.0)


def encode(code: LDPCCode, info: jnp.ndarray) -> jnp.ndarray:
    """Encode systematic info bits (filler already zeroed).

    info: [..., K] float {0,1} -> codeword [..., num_cols*Z] including the
    2Z punctured systematic bits (caller punctures).
    """
    z = code.z
    blocks = info.reshape(info.shape[:-1] + (code.k_b, z))

    def row_info_sum(r):
        acc = jnp.zeros(info.shape[:-1] + (z,), info.dtype)
        cnt = 0
        for c in code.rows[r]:
            if c < code.k_b:
                acc = acc + jnp.roll(blocks[..., c, :], -code.shifts[(r, c)],
                                     axis=-1)
                cnt += 1
        return jnp.mod(acc, 2.0) if cnt else acc

    lam = [row_info_sum(r) for r in range(4)]

    # Core parity (38.212 structured encoding): summing the four lifted
    # core rows cancels the shift-0 staircase, leaving
    #   (P_{s0} + P_{s1} + P_{s2}) p1 = lam0+lam1+lam2+lam3
    # over the weight-3 special column's shifts (s0, s1, s2). The spec
    # tables guarantee two of the three are equal, so the paired circulants
    # cancel in GF(2) and a single P_t survives (t = the odd-one-out shift;
    # t = the common value when all three are equal). P_t p1 = lam_sum
    # with P_t x = roll(x, -t)  =>  p1 = roll(lam_sum, +t).
    # Covers the real tables' special cases (BG1 i_LS=6: t=105 mod Z;
    # BG2 i_LS in {3,7}: t=1) as well as the generated fallback's (s,0,s).
    s3 = [code.shifts[(r, code.k_b)] for r in SPECIAL_ROWS[code.bg]]
    if s3[0] == s3[1] == s3[2]:
        t = s3[0]
    elif s3[0] == s3[1]:
        t = s3[2]
    elif s3[0] == s3[2]:
        t = s3[1]
    elif s3[1] == s3[2]:
        t = s3[0]
    else:  # validator rejects this at table load; defend anyway
        raise ValueError(f"special column shifts {s3} all distinct")
    lam_sum = jnp.mod(lam[0] + lam[1] + lam[2] + lam[3], 2.0)
    p1 = jnp.roll(lam_sum, t, axis=-1)

    def p1_term(r):
        if (r, code.k_b) in code.shifts and code.k_b in code.rows[r]:
            return jnp.roll(p1, -code.shifts[(r, code.k_b)], axis=-1)
        return jnp.zeros_like(p1)

    # Staircase back-substitution: row r involves parity cols k_b+r, k_b+r+1
    p2 = _xor(lam[0], p1_term(0))
    p3 = _xor(_xor(lam[1], p1_term(1)), p2)
    p4 = _xor(_xor(lam[2], p1_term(2)), p3)
    core = [p1, p2, p3, p4]

    # Extension parities (rows >= 4): p_ext = sum over info+core terms.
    ext = []
    all_blocks = [blocks[..., c, :] for c in range(code.k_b)] + core
    for r in range(4, code.num_rows):
        acc = jnp.zeros_like(p1)
        for c in code.rows[r]:
            if c < code.k_b + 4:
                acc = acc + jnp.roll(all_blocks[c], -code.shifts[(r, c)],
                                     axis=-1)
        ext.append(jnp.mod(acc, 2.0))

    cw = jnp.concatenate([info] + [b for b in core] + ext, axis=-1)
    return cw


def _phi(x):
    """phi(x) = -log(tanh(x/2)), self-inverse, stable-clamped."""
    x = jnp.clip(x, 8.5e-4, 16.635)
    return jnp.log((jnp.exp(x) + 1.0) / (jnp.exp(x) - 1.0))


def decode(code: LDPCCode, llr_ch: jnp.ndarray, num_iter: int = 20,
           cn_type: str = "boxplus") -> jnp.ndarray:
    """BP-decode channel LLRs.

    llr_ch: [..., num_cols*Z] in internal convention log(p0/p1)
    (punctured positions = 0, filler positions = +big).
    Returns hard bits [..., num_cols*Z].
    """
    z = code.z
    batch_shape = llr_ch.shape[:-1]
    llr_blocks = llr_ch.reshape(batch_shape + (code.num_cols, z))
    to_check = jnp.asarray(code.to_check_idx)
    to_var = jnp.asarray(code.to_var_idx)
    row_onehot = jnp.asarray(code.row_onehot)
    col_onehot = jnp.asarray(code.col_onehot)
    edge_row = jnp.asarray(code.edge_row)
    edge_col = jnp.asarray(code.edge_col)

    def expand(idx):
        return jnp.broadcast_to(idx, batch_shape + idx.shape)

    c2v0 = jnp.zeros(batch_shape + (code.num_edges, z), llr_ch.dtype)

    def iteration(c2v, _):
        # --- variable update ---
        c2v_var = jnp.take_along_axis(c2v, expand(to_var), axis=-1)
        col_sums = jnp.einsum("...ez,ec->...cz", c2v_var, col_onehot)
        v_total = llr_blocks + col_sums
        v2c = (jnp.take_along_axis(v_total[..., edge_col, :],
                                   expand(to_check), axis=-1)
               - c2v)
        # --- check update (all-but-self boxplus / minsum) ---
        sgn = jnp.where(v2c < 0, -1.0, 1.0)
        neg = (v2c < 0).astype(llr_ch.dtype)
        row_neg = jnp.einsum("...ez,er->...rz", neg, row_onehot)
        # sign of product of others = row sign parity / own sign
        others_neg = row_neg[..., edge_row, :] - neg
        sign_out = 1.0 - 2.0 * jnp.mod(others_neg, 2.0)
        mag = jnp.abs(v2c)
        if cn_type == "boxplus":
            pm = _phi(mag)
            row_pm = jnp.einsum("...ez,er->...rz", pm, row_onehot)
            mag_out = _phi(row_pm[..., edge_row, :] - pm)
        elif cn_type == "minsum":
            # normalized min-sum: padded per-row gather, two-minima trick
            big = jnp.asarray(1e9, llr_ch.dtype)
            padded = jnp.where(jnp.asarray(code.row_edge_mask)[:, :, None],
                               mag[..., jnp.asarray(code.row_edges), :], big)
            min1 = jnp.min(padded, axis=-2, keepdims=True)
            arg1 = jnp.argmin(padded, axis=-2, keepdims=True)
            padded2 = jnp.where(
                jnp.arange(padded.shape[-2])[:, None] == arg1, big, padded)
            min2 = jnp.min(padded2, axis=-2, keepdims=True)
            is_min = (jnp.arange(padded.shape[-2])[:, None] == arg1)
            others_min = jnp.where(is_min, min2, min1)
            # scatter back to flat edges
            mag_out = 0.8125 * others_min.reshape(
                batch_shape + (-1, z))[..., jnp.asarray(code.row_edge_inv), :]
        else:
            raise ValueError(f"unknown cn_type {cn_type}")
        return sign_out * mag_out, None

    c2v, _ = jax.lax.scan(iteration, c2v0, None, length=num_iter)

    c2v_var = jnp.take_along_axis(c2v, expand(to_var), axis=-1)
    col_sums = jnp.einsum("...ez,ec->...cz", c2v_var, col_onehot)
    v_total = llr_blocks + col_sums
    bits = (v_total < 0).astype(llr_ch.dtype)
    return bits.reshape(batch_shape + (code.n_full,))
