"""Pallas TPU kernel: layered normalized-min-sum QC-LDPC decoder.

Why: the flooding boxplus decoder in phy/nr/ldpc.py expresses per-edge
lifted-frame changes as [E, Z] gathers and one-hot matmuls — correct and
MXU-friendly, but each BP iteration streams the whole [E, Z] message
state through HBM, and Monte-Carlo BLER evaluation is dominated by it
(measured ~50x the CGNN cost per eval step).

This kernel keeps the entire decoder state in VMEM for all iterations:
- APP (a-posteriori LLRs) [num_cols, Z] and check messages [E, Z] live
  in VMEM scratch for a tile of codewords; HBM traffic is one load of
  the channel LLRs and one store of the hard bits.
- The QC cyclic shifts are STATIC per edge, so each lifted-frame change
  is a single lane-rotate (`pltpu.roll`), not a gather.
- Layered scheduling (check rows processed sequentially, APP updated in
  place) with normalized min-sum (alpha = 0.8125, same constant as the
  flooding decoder's min-sum mode). The default is the reference's 20
  iterations: measured on the nrx_rt eval transport block (BG1, Z=384,
  rate 0.54), 10 layered iterations are NOT enough (BLER 0.98 at an
  Eb/No where both flooding-20 and layered-20 decode every block —
  logs/ldpc_iter_sweep3.log); at 20 iterations the layered decoder
  matches flooding BLER and is still ~4x faster end-to-end per
  Monte-Carlo eval step (statistical equivalence covered by
  tests/test_ldpc_pallas.py).

The kernel is the fast eval path; `tb_decode` keeps the reference-
faithful flooding boxplus as the default algorithm.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phy.nr.ldpc import LDPCCode
from .sepconv_pallas import _interpret_default

_ALPHA = 0.8125  # normalized min-sum scaling (matches ldpc.py minsum)


def _row_plan(code: LDPCCode):
    """Static per-row (col, shift, edge_index) schedule."""
    plan = []
    e = 0
    emap = {}
    for r, cols in enumerate(code.rows):
        entries = []
        for c in cols:
            entries.append((c, int(code.shifts[(r, c)]), e))
            emap[(r, c)] = e
            e += 1
        plan.append(entries)
    return plan


def _pad_lanes(z: int) -> int:
    return ((z + 127) // 128) * 128


def auto_tile(code: LDPCCode, budget_bytes: int = 12 * 2**20) -> int:
    """Largest power-of-two codeword tile whose whole VMEM footprint
    (APP + check-message scratch + double-buffered in/out blocks) fits
    `budget_bytes`. tile=16 at BG1/Z=384 totals ~16.1 MB — right AT the
    16 MB scoped-vmem limit: some surrounding programs tip it over the
    edge (observed: the 64qam eval step OOMs while the nrx_rt one
    compiles), so the default budget leaves headroom."""
    zp = _pad_lanes(code.z)
    per_cw = (code.num_cols + code.num_edges) * zp * 4  # scratch
    per_cw += 4 * code.num_cols * zp * 4  # 2x double-buffered in+out
    tile = 16
    while tile > 1 and tile * per_cw > budget_bytes:
        tile //= 2
    return tile


def make_decoder(code: LDPCCode, num_iter: int = 20,
                 interpret: bool | None = None, tile: int | None = None):
    """Build a jittable layered min-sum decoder for one (bg, z) code.

    Returns fn(llr_ch [batch, num_cols*Z] internal-convention
    log(p0/p1)) -> hard bits [batch, num_cols*Z].

    `tile` codewords are decoded per kernel instance: every per-row VPU
    op works on a [tile, Z] block instead of [1, Z], filling all 8
    sublanes of the vector registers (a [1, 384] op uses 1/8 of the
    VPU). The tile is auto-sized by `auto_tile` to a 12 MB VMEM budget
    counting scratch plus 4x double-buffered in/out blocks (tile=8 for
    BG1/Z=384); pass `tile` to override. VMEM state is
    tile * (num_cols + num_edges) * Z * 4 B
    (~4.7 MB for BG1/Z=384 at tile=8, ~9.4 MB at tile=16 —
    both VMEM-resident; measured on chip 2026-08-19,
    scripts/bench_ldpc_tile.py at batch 30 / BG1 / Z=384 / 20 iters:
    tile=1 5.09 ms, tile=8 0.68 ms, tile=16 0.38 ms per call — 79.6k
    codewords/s, ~5000x the XLA flooding decoder's 1875 ms).

    interpret=None auto-selects pallas interpret mode off-TPU so the
    fast path also runs on CPU (tests, debug)."""
    import jax
    interpret = _interpret_default(interpret)
    if tile is None:
        tile = auto_tile(code)
    z = code.z
    zp = _pad_lanes(z)
    n_cols = code.num_cols
    plan = _row_plan(code)
    n_edges = code.num_edges

    def _roll(x, shift):
        # x: [tile, zp]; cyclic rotate of the leading z lanes by a
        # STATIC shift: out[:, j] = x[:, (j + s) % z] for j < z.
        # When zp == z this is one lane-rotate. Otherwise (z not a lane
        # multiple, e.g. the e2e configs' Z=352) it is composed from two
        # full-zp rotates + a lane select: a covers j < z-s (reads
        # x[j+s], all indices < z), b covers j >= z-s (reads x[j+s-z],
        # indices < s) — pad lanes are never read for valid out lanes,
        # so whatever garbage they accumulate stays in the pad lanes
        # (every other decoder op is lane-wise).
        s = (-shift) % z  # pltpu.roll(x, r)[j] = x[(j - r) % zp]
        if s == 0:
            return x
        if zp == z:
            return pltpu.roll(x, zp - s, 1)
        a = pltpu.roll(x, zp - s, 1)
        b = pltpu.roll(x, (zp - s + z) % zp, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(col < z - s, a, b)

    def kernel(llr_ref, out_ref, app_ref, c2v_ref):
        # HBM blocks are [tile, n_cols, zp] (batch leading: Mosaic needs
        # the block's last two dims divisible by (8, 128) or equal to
        # the array dims — a [.., tile, zp] block with tile=1 violates
        # that). VMEM scratch keeps the [n_cols, tile, zp] layout so the
        # per-column working slice stays a contiguous [tile, zp] block;
        # the swap happens in the per-column load/store loops below (68
        # static slices — no in-kernel transpose op).
        for c in range(n_cols):
            app_ref[c] = llr_ref[:, c, :]
        c2v_ref[:, :, :] = jnp.zeros_like(c2v_ref)

        # fori_loop keeps the traced graph to ONE iteration (the row
        # schedule below unrolls ~E lane-rotates; x num_iter would blow
        # up Mosaic compile time)
        def one_iteration(_, carry):
            for entries in plan:
                # gather extrinsic v2c messages in the check frame
                v2cs = []
                for (c, s, e) in entries:
                    t = _roll(app_ref[c], -s) - c2v_ref[e]
                    v2cs.append(t)
                # normalized min-sum across the row (two-minima trick)
                sign = jnp.ones_like(v2cs[0])
                for t in v2cs:
                    sign = sign * jnp.where(t < 0, -1.0, 1.0)
                mags = [jnp.abs(t) for t in v2cs]
                big = jnp.full_like(mags[0], 1e30)
                min1 = functools.reduce(jnp.minimum, mags)
                # second minimum: mask only the FIRST occurrence of the
                # minimum per lane, then min again
                taken = jnp.zeros_like(mags[0], dtype=jnp.bool_)
                firsts = []
                masked = []
                for m in mags:
                    first = jnp.logical_and(m <= min1,
                                            jnp.logical_not(taken))
                    taken = jnp.logical_or(taken, first)
                    firsts.append(first)
                    masked.append(jnp.where(first, big, m))
                min2 = functools.reduce(jnp.minimum, masked)
                # update messages + APP in place
                for (c, s, e), t, first in zip(entries, v2cs, firsts):
                    other_min = jnp.where(first, min2, min1)
                    sgn_e = jnp.where(t < 0, -1.0, 1.0)
                    new_msg = _ALPHA * sign * sgn_e * other_min
                    c2v_ref[e] = new_msg
                    app_ref[c] = _roll(t + new_msg, s)
            return carry

        jax.lax.fori_loop(0, num_iter, one_iteration, 0)
        for c in range(n_cols):
            out_ref[:, c, :] = jnp.where(app_ref[c] < 0, 1.0, 0.0)

    @functools.lru_cache(maxsize=8)
    def make_call(n_tiles):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((tile, n_cols, zp),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, n_cols, zp),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, n_cols, zp),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_cols, tile, zp), jnp.float32),
                pltpu.VMEM((n_edges, tile, zp), jnp.float32),
            ],
            interpret=interpret,
        )

    def decode(llr_ch: jnp.ndarray) -> jnp.ndarray:
        batch_shape = llr_ch.shape[:-1]
        blocks = llr_ch.reshape((-1, n_cols, z))
        n = blocks.shape[0]
        n_tiles = -(-n // tile)
        pad_n = n_tiles * tile - n
        if zp != z:
            blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, zp - z)))
        if pad_n:
            blocks = jnp.pad(blocks, ((0, pad_n), (0, 0), (0, 0)))
        bits = make_call(n_tiles)(blocks)[:n, :, :z]
        return bits.reshape(batch_shape + (n_cols * z,))

    return decode


def reference_layered_decode(code: LDPCCode, llr_ch: np.ndarray,
                             num_iter: int = 20) -> np.ndarray:
    """NumPy oracle of the exact layered min-sum schedule the pallas
    kernel implements (same update order, same first-minimum masking).
    llr_ch: [num_cols*Z] internal convention -> hard bits."""
    z = code.z
    plan = _row_plan(code)
    app = llr_ch.reshape(code.num_cols, z).astype(np.float64).copy()
    c2v = np.zeros((code.num_edges, z))
    for _ in range(num_iter):
        for entries in plan:
            v2cs = [np.roll(app[c], -s) - c2v[e] for (c, s, e) in entries]
            sign = np.prod([np.where(t < 0, -1.0, 1.0) for t in v2cs],
                           axis=0)
            mags = [np.abs(t) for t in v2cs]
            min1 = np.min(mags, axis=0)
            taken = np.zeros(z, bool)
            firsts, masked = [], []
            for m in mags:
                first = (m <= min1) & ~taken
                taken |= first
                firsts.append(first)
                masked.append(np.where(first, 1e30, m))
            min2 = np.min(masked, axis=0)
            for (c, s, e), t, first in zip(entries, v2cs, firsts):
                other = np.where(first, min2, min1)
                sgn_e = np.where(t < 0, -1.0, 1.0)
                new_msg = _ALPHA * sign * sgn_e * other
                c2v[e] = new_msg
                app[c] = np.roll(t + new_msg, s)
    return (app < 0).astype(np.float32).reshape(-1)


def tb_decode_fast(cfg, llr: jnp.ndarray, num_iter: int = 20,
                   interpret: bool | None = None):
    """Drop-in fast variant of phy.nr.tb.tb_decode using the pallas
    layered decoder (same I/O contract; delegates the shared
    descramble/rate-recover/CRC scaffolding to tb_decode). Covers every
    lifting size (non-lane-multiple Z, e.g. the e2e configs' Z=352, use
    the two-rotate composed cyclic shift)."""
    from ..phy.nr.tb import tb_decode
    decoder = make_decoder(cfg.code, num_iter=num_iter,
                           interpret=interpret)
    return tb_decode(cfg, llr, decoder=decoder)
