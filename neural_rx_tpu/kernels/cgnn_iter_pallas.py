"""Fused CGNN iteration as a single Pallas TPU kernel.

One receiver iteration (reference CGNNIt, neural_rx.py:273-306 original
semantics) is: per-RE aggregation MLP -> masked sum-minus-self over
users -> concat [a, s, pe] -> separable-conv update stack -> residual.
The XLA path materializes the aggregation activations and the 130-
channel concat in HBM every iteration (~35 MB of round-trip traffic per
iteration at the 132-PRB real-time shape). This kernel keeps the whole
iteration's activations in VMEM:

- grid (batch, W-block), with ALL max_num_tx user states resident in
  one kernel instance (the user sum needs every user's aggregation
  output at the same RE, so users cannot be a grid axis);
- the aggregation MLP runs on the MXU over [H*w_ext, d_s], the
  sum-minus-self and normalization on the VPU, and the update stack
  reuses the overlap-save machinery of kernels/sepconv_pallas
  (_run_stack: 9-slice depthwise + pointwise MXU matmul per layer);
- halo columns are fetched from neighboring W-blocks through BlockSpec
  pipelining (double-buffered), exactly like fused_conv_stack_blocked;
  the aggregation is per-RE so it needs no halo of its own — it simply
  also runs on the conv halo columns;
- out-of-grid columns (bucket padding) are re-zeroed before every conv
  layer by _run_stack's in_grid mask, which also kills the
  bias-propagated aggregation output on pad columns (the same semantics
  as the XLA path's explicit `a` mask in rx/cgnn.cgnn_apply).

Inputs/outputs stay in the caller's dtype (bf16 on TPU); accumulation
is f32. Serving path only (no custom VJP): training keeps the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv_pallas import (_run_stack, _flatten_weights, _valid_range,
                             _mxu_default, _lp_default,
                             _interpret_default)


def _iter_kernel(num_tx, n_hidden, halo, w_blk, out_dtype, mxu,
                 lp_stencil, readout, chest, nblk, valid_ref, act_ref,
                 *refs):
    """refs layout: per user t: (left_t, mid_t, right_t) s blocks; then
    per user t: (left, mid, right) pe blocks (pe is per-user — each
    user has its own pilot pattern); then agg weights (w1, b1, w2, b2);
    then update-stack (dw, pw, b) per layer; if readout, then the LLR
    readout MLP weights (rw1, rb1, rw2, rb2) and, if chest, the chest
    readout MLP weights (cw1, cb1, cw2, cb2); then the out refs —
    num_tx next states, or when readout the num_tx per-user LLR grids
    followed (if chest) by num_tx per-user chest grids: the final
    iteration's state never leaves VMEM in that mode, and BOTH readouts
    run on it in-kernel (the reference's deployed engine returns
    (llr, h_hat), reference neural_rx.py:1796-1812).
    act_ref (SMEM [batch, num_tx], whole array — a (1, T) block would
    violate the (8, 128) block rule at batch > 1): active_tx, indexed by
    program_id(0). valid_ref (SMEM [2]): [lo, hi) valid column range.
    nblk: 3 = overlap-save (left/mid/right per user), 1 = whole-grid
    residency (halo == 0; the VMEM buffer edge IS the grid edge, so the
    stencil's concat-zero-pad gives SAME-conv semantics directly)."""
    n_out = num_tx * (2 if (readout and chest) else 1)
    s_blocks = refs[:nblk * num_tx]
    pe_blocks = refs[nblk * num_tx:2 * nblk * num_tx]
    agg_refs = refs[2 * nblk * num_tx:2 * nblk * num_tx + 4]
    out_refs = refs[-n_out:]
    wrefs = refs[2 * nblk * num_tx + 4:-n_out]
    ro_refs = ch_refs = None
    if readout:
        if chest:
            ch_refs = wrefs[-4:]
            wrefs = wrefs[:-4]
        ro_refs = wrefs[-4:]
        wrefs = wrefs[:-4]

    bi = pl.program_id(0)
    wb = pl.program_id(1) if nblk == 3 else 0
    lo, hi = valid_ref[0], valid_ref[1]
    w_ext = w_blk + 2 * halo

    if nblk == 3:
        def halo_cat(l, m, r):
            return jnp.concatenate(
                [l[0, :, w_blk - halo:, :], m[0], r[0, :, :halo, :]],
                axis=1)
    else:
        assert halo == 0

        def halo_cat(m):
            return m[0]

    h = s_blocks[0].shape[1]

    w1 = agg_refs[0][:]
    b1 = agg_refs[1][:]
    w2 = agg_refs[2][:]
    b2 = agg_refs[3][:]

    # aggregation MLP for ALL users in single stacked ops (per-RE; also
    # over halo columns), masked by active_tx; f32 accumulation on the
    # MXU, activations bf16. Stacking the T user states as a leading
    # axis halves the op count and doubles the matmul rows vs the
    # original per-user loop.
    s_ext = jnp.stack(
        [halo_cat(*s_blocks[nblk * t:nblk * t + nblk])
         for t in range(num_tx)],
        axis=0)  # [T, H, w_ext, d_s]
    d_s = s_ext.shape[-1]
    x = s_ext.reshape(num_tx * h * w_ext, d_s)
    y = jax.lax.dot_general(
        x, w1.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1.astype(jnp.float32)[None, :], 0.0)
    y = y.astype(out_dtype)
    y = jax.lax.dot_general(
        y, w2.astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32)[None, :]
    # [T,1,1,1] per-user mask built from SMEM scalars via predicate
    # broadcasts (NOT a stacked [T] lane-vector: relayouting a 2-lane
    # vector onto the leading axis is Mosaic-hostile)
    tvec = jax.lax.broadcasted_iota(jnp.int32, (num_tx, 1, 1, 1), 0)
    act4 = functools.reduce(
        lambda p, q: p + q,
        [act_ref[bi, t].astype(out_dtype)
         * (tvec == t).astype(out_dtype) for t in range(num_tx)])
    sps = y.reshape(num_tx, h, w_ext, -1).astype(out_dtype) * act4

    tot = jnp.sum(sps, axis=0)  # [H, w_ext, d_s]
    cnt = functools.reduce(
        lambda p, q: p + q,
        [act_ref[bi, t].astype(jnp.float32) for t in range(num_tx)]) - 1.0
    cnt = jnp.maximum(cnt, 0.0)
    scale = jnp.where(cnt == 0.0, 1.0,
                      1.0 / jnp.maximum(cnt, 1.0)).astype(out_dtype)

    # true-grid column index of each buffer column (pad re-zeroing)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, w_ext, 1), 1)
           + wb * w_blk - halo)
    in_grid = (col >= lo) & (col < hi)

    a_all = (tot[None] - sps) * scale  # [T, H, w_ext, d_s]
    pe_ext = jnp.stack(
        [halo_cat(*pe_blocks[nblk * t:nblk * t + nblk])
         for t in range(num_tx)],
        axis=0)  # [T, H, w_ext, 2]
    z = jnp.concatenate([a_all, s_ext, pe_ext], axis=-1)
    u = _run_stack(z, wrefs, n_hidden, out_dtype, in_grid=in_grid,
                   mxu=mxu, lp_stencil=lp_stencil)  # [T, H, w_ext, d_s]
    u = u[:, :, halo:halo + w_blk, :]
    mid = nblk // 2  # index of each user's own block (1 of 3, or 0 of 1)
    if not readout:
        for t in range(num_tx):
            out_refs[t][0] = u[t] + s_blocks[nblk * t + mid][0]
        return
    # fused readouts on the residual states (per-RE MLPs, one hidden
    # layer, all users in one matmul): the final state stays in VMEM.
    # Both ReadoutLLRs and (when chest) ReadoutChEst run here — the
    # reference's deployed engine computes and returns both
    # (neural_rx.py:1796-1812).
    s_new = u + jnp.stack([s_blocks[nblk * t + mid][0]
                           for t in range(num_tx)], axis=0)
    x = s_new.reshape(num_tx * h * w_blk, d_s)

    def ro_mlp(w_refs):
        r = jax.lax.dot_general(
            x, w_refs[0][:].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jnp.maximum(r + w_refs[1][:].astype(jnp.float32)[None, :],
                        0.0).astype(out_dtype)
        r = jax.lax.dot_general(
            r, w_refs[2][:].astype(r.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = r + w_refs[3][:].astype(jnp.float32)[None, :]
        return r.reshape(num_tx, h, w_blk, -1).astype(out_dtype)

    r = ro_mlp(ro_refs)
    for t in range(num_tx):
        out_refs[t][0] = r[t]
    if chest:
        c = ro_mlp(ch_refs)
        for t in range(num_tx):
            out_refs[num_tx + t][0] = c[t]


def _flatten_dense(p, dtype):
    """agg MLP with exactly one hidden layer -> (w1, b1, w2, b2) ops +
    whole-array VMEM specs (matches _apply_mlp for len(hidden) == 1)."""
    assert len(p["hidden"]) == 1, "fused iteration: 1 hidden agg layer"
    ops, specs = [], []
    for a in (p["hidden"][0]["w"].astype(dtype), p["hidden"][0]["b"].astype(
            dtype), p["out"]["w"].astype(dtype), p["out"]["b"].astype(dtype)):
        ops.append(a)
        specs.append(pl.BlockSpec(
            a.shape, lambda *_i, _s=a.shape: (0,) * len(_s),
            memory_space=pltpu.VMEM))
    return ops, specs


@functools.partial(jax.jit,
                   static_argnames=("num_tx", "w_blk", "interpret",
                                    "mxu", "lp_stencil"))
def _fused_iteration_impl(agg_p, upd_p, s, pe, active_tx, sc_valid,
                          num_tx: int, w_blk: int,
                          interpret: bool | None = None,
                          mxu: bool = False, lp_stencil: bool = False,
                          readout_p=None, chest_p=None):
    interpret = _interpret_default(interpret)
    layers = list(upd_p["hidden"]) + [upd_p["out"]]
    b, t, h, w, d_s = s.shape
    assert t == num_tx
    dtype = s.dtype
    # whole-grid residency: one W block spanning the (128-aligned) full
    # width — no halos, no neighbor fetches, no per-block weight
    # reloads; needs a raised scoped-vmem budget (NRX_COMPILER_OPTS /
    # XLA_FLAGS --xla_tpu_scoped_vmem_limit_kib, see bench_fused_iter)
    whole = w_blk >= w
    if whole:
        w_blk = -(-w // 128) * 128
        halo = 0
    else:
        halo = -(-len(layers) // 8) * 8  # conv halo rounded to sublanes
    assert halo <= w_blk

    n_wb = -(-w // w_blk)
    w_pad = n_wb * w_blk
    # No zero blocks on the sides: edge blocks fetch a CLAMPED neighbor
    # (their own block) and the halo columns they contribute are
    # out-of-grid, so _run_stack's in_grid mask zeroes them before
    # every layer — identical SAME-conv semantics without writing
    # 2*w_blk zero columns to HBM per operand per call (measured round
    # 3: the pads were ~8% of the serving slot).
    s_ext = jnp.pad(s.reshape(b * t, h, w, d_s),
                    ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    pe_ext = jnp.pad(pe.astype(dtype),
                     ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))

    def clamp(i):
        return jnp.clip(i, 0, n_wb - 1)

    agg_ops, agg_specs = _flatten_dense(agg_p, dtype)
    upd_ops, upd_specs = _flatten_weights(layers, dtype)
    if readout_p is not None:
        ro_ops, ro_specs = _flatten_dense(readout_p, dtype)
        upd_ops = upd_ops + ro_ops
        upd_specs = upd_specs + ro_specs
        if chest_p is not None:
            ch_ops, ch_specs = _flatten_dense(chest_p, dtype)
            upd_ops = upd_ops + ch_ops
            upd_specs = upd_specs + ch_specs

    def s_blk(tt, off):
        return pl.BlockSpec(
            (1, h, w_blk, d_s),
            lambda i, wb, _t=tt, _o=off: (i * num_tx + _t, 0,
                                          clamp(wb + _o - 1), 0),
            memory_space=pltpu.VMEM)

    def pe_blk(tt, off):
        return pl.BlockSpec(
            (1, h, w_blk, pe.shape[-1]),
            lambda i, wb, _t=tt, _o=off: (_t, 0, clamp(wb + _o - 1), 0),
            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [sc_valid, active_tx.astype(jnp.float32)]
    specs = []
    offs = (1,) if whole else (0, 1, 2)  # off 1 == own block
    for tt in range(num_tx):
        for off in offs:
            specs.append(s_blk(tt, off))
            operands.append(s_ext)
    for tt in range(num_tx):
        for off in offs:
            specs.append(pe_blk(tt, off))
            operands.append(pe_ext)
    in_specs += specs + agg_specs + upd_specs
    operands += agg_ops + upd_ops

    d_out = (layers[-1]["pw"].shape[1] if readout_p is None
             else readout_p["out"]["w"].shape[1])
    d_outs = [d_out] * num_tx
    if readout_p is not None and chest_p is not None:
        d_outs += [chest_p["out"]["w"].shape[1]] * num_tx
    out_specs = [pl.BlockSpec((1, h, w_blk, d),
                              lambda i, wb: (i, 0, wb, 0),
                              memory_space=pltpu.VMEM)
                 for d in d_outs]
    out_shapes = [jax.ShapeDtypeStruct((b, h, w_pad, d), dtype)
                  for d in d_outs]

    kernel = functools.partial(_iter_kernel, num_tx,
                               len(upd_p["hidden"]), halo, w_blk, dtype,
                               mxu, lp_stencil, readout_p is not None,
                               chest_p is not None, len(offs))
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_wb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)
    llr = jnp.stack(outs[:num_tx], axis=1)[:, :, :, :w, :]
    if readout_p is not None and chest_p is not None:
        ch = jnp.stack(outs[num_tx:], axis=1)[:, :, :, :w, :]
        return llr, ch
    return llr


def _full_kernel(num_tx, n_hid_init, n_hid_upd, num_it, w_blk,
                 out_dtype, lp_stencil, valid_ref, act_ref, *refs):
    """Whole-receiver mega-kernel body: init conv stack + every CGNN
    iteration (aggregation MLP + masked user sum + concat + update
    stack + residual) + BOTH readouts, entirely VMEM-resident — the
    state tensor never touches HBM between stages. Whole-grid only
    (halo-free; the VMEM buffer edge IS the grid edge).

    refs layout: per user t: z0 block [1, H, W, C_in]; per user t: pe
    block [1, H, W, 2]; init stack (dw, pw, b) x (n_hid_init+1); per
    iteration i: agg (w1, b1, w2, b2) then update (dw, pw, b) x
    (n_hid_upd+1); LLR readout (w1, b1, w2, b2); chest readout
    (w1, b1, w2, b2); then num_tx LLR out refs + num_tx chest out refs.
    """
    z0_blocks = refs[:num_tx]
    pe_blocks = refs[num_tx:2 * num_tx]
    out_refs = refs[-2 * num_tx:]
    wrefs = list(refs[2 * num_tx:-2 * num_tx])
    init_refs = wrefs[:3 * (n_hid_init + 1)]
    wrefs = wrefs[3 * (n_hid_init + 1):]
    per_it = 4 + 3 * (n_hid_upd + 1)
    it_refs = [wrefs[i * per_it:(i + 1) * per_it] for i in range(num_it)]
    ro_refs = wrefs[num_it * per_it:num_it * per_it + 4]
    ch_refs = wrefs[num_it * per_it + 4:num_it * per_it + 8]

    bi = pl.program_id(0)
    lo, hi = valid_ref[0], valid_ref[1]
    h = z0_blocks[0].shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w_blk, 1), 1)
    in_grid = (col >= lo) & (col < hi)

    # ---- init stack over all users (leading-axis vectorized) ----
    z0 = jnp.stack([z0_blocks[t][0] for t in range(num_tx)], axis=0)
    s = _run_stack(z0, init_refs, n_hid_init, out_dtype,
                   in_grid=in_grid, mxu=False,
                   lp_stencil=lp_stencil)  # [T, H, W, d_s]
    d_s = s.shape[-1]
    pe = jnp.stack([pe_blocks[t][0] for t in range(num_tx)], axis=0)

    # per-user active mask [T,1,1,1] from SMEM scalars (predicate
    # broadcasts; see _iter_kernel)
    tvec = jax.lax.broadcasted_iota(jnp.int32, (num_tx, 1, 1, 1), 0)
    act4 = functools.reduce(
        lambda p, q: p + q,
        [act_ref[bi, t].astype(out_dtype)
         * (tvec == t).astype(out_dtype) for t in range(num_tx)])
    cnt = functools.reduce(
        lambda p, q: p + q,
        [act_ref[bi, t].astype(jnp.float32) for t in range(num_tx)]) - 1.0
    cnt = jnp.maximum(cnt, 0.0)
    scale = jnp.where(cnt == 0.0, 1.0,
                      1.0 / jnp.maximum(cnt, 1.0)).astype(out_dtype)

    # ---- iterations ----
    for i in range(num_it):
        w1, b1, w2, b2 = (r[:] for r in it_refs[i][:4])
        upd = it_refs[i][4:]
        x = s.reshape(num_tx * h * w_blk, d_s)
        y = jax.lax.dot_general(
            x, w1.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b1.astype(jnp.float32)[None, :], 0.0)
        y = y.astype(out_dtype)
        y = jax.lax.dot_general(
            y, w2.astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b2.astype(jnp.float32)[None, :]
        sps = y.reshape(num_tx, h, w_blk, d_s).astype(out_dtype) * act4
        tot = jnp.sum(sps, axis=0)
        a_all = (tot[None] - sps) * scale
        z = jnp.concatenate([a_all, s, pe], axis=-1)
        u = _run_stack(z, upd, n_hid_upd, out_dtype, in_grid=in_grid,
                       mxu=False, lp_stencil=lp_stencil)
        s = u + s

    # ---- readouts on the final state ----
    x = s.reshape(num_tx * h * w_blk, d_s)

    def ro_mlp(w_refs):
        r = jax.lax.dot_general(
            x, w_refs[0][:].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jnp.maximum(r + w_refs[1][:].astype(jnp.float32)[None, :],
                        0.0).astype(out_dtype)
        r = jax.lax.dot_general(
            r, w_refs[2][:].astype(r.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = r + w_refs[3][:].astype(jnp.float32)[None, :]
        return r.reshape(num_tx, h, w_blk, -1).astype(out_dtype)

    r = ro_mlp(ro_refs)
    c = ro_mlp(ch_refs)
    for t in range(num_tx):
        out_refs[t][0] = r[t]
        out_refs[num_tx + t][0] = c[t]


@functools.partial(jax.jit,
                   static_argnames=("num_tx", "num_it", "interpret",
                                    "lp_stencil"))
def _fused_cgnn_full_impl(init_p, it_ps, ro_p, ch_p, z0, pe, active_tx,
                          sc_valid, num_tx: int, num_it: int,
                          interpret: bool | None = None,
                          lp_stencil: bool = False):
    interpret = _interpret_default(interpret)
    b, t, h, w, c_in = z0.shape
    assert t == num_tx
    dtype = z0.dtype
    w_blk = -(-w // 128) * 128

    init_layers = list(init_p["hidden"]) + [init_p["out"]]
    init_ops, init_specs = _flatten_weights(init_layers, dtype)
    it_ops, it_specs = [], []
    for it_p in it_ps:
        a_ops, a_specs = _flatten_dense(it_p["agg"], dtype)
        u_layers = list(it_p["update"]["hidden"]) + [it_p["update"]["out"]]
        u_ops, u_specs = _flatten_weights(u_layers, dtype)
        it_ops += a_ops + u_ops
        it_specs += a_specs + u_specs
    ro_ops, ro_specs = _flatten_dense(ro_p, dtype)
    ch_ops, ch_specs = _flatten_dense(ch_p, dtype)

    z0_ext = jnp.pad(z0.reshape(b * t, h, w, c_in),
                     ((0, 0), (0, 0), (0, w_blk - w), (0, 0)))
    pe_ext = jnp.pad(pe.astype(dtype),
                     ((0, 0), (0, 0), (0, w_blk - w), (0, 0)))

    def z0_blk(tt):
        return pl.BlockSpec(
            (1, h, w_blk, c_in),
            lambda i, _t=tt: (i * num_tx + _t, 0, 0, 0),
            memory_space=pltpu.VMEM)

    def pe_blk(tt):
        return pl.BlockSpec(
            (1, h, w_blk, pe.shape[-1]),
            lambda i, _t=tt: (_t, 0, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [sc_valid, active_tx.astype(jnp.float32)]
    for tt in range(num_tx):
        in_specs.append(z0_blk(tt))
        operands.append(z0_ext)
    for tt in range(num_tx):
        in_specs.append(pe_blk(tt))
        operands.append(pe_ext)
    in_specs += init_specs + it_specs + ro_specs + ch_specs
    operands += init_ops + it_ops + ro_ops + ch_ops

    d_llr = ro_p["out"]["w"].shape[1]
    d_ch = ch_p["out"]["w"].shape[1]
    d_outs = [d_llr] * num_tx + [d_ch] * num_tx
    out_specs = [pl.BlockSpec((1, h, w_blk, d),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
                 for d in d_outs]
    out_shapes = [jax.ShapeDtypeStruct((b, h, w_blk, d), dtype)
                  for d in d_outs]

    kernel = functools.partial(
        _full_kernel, num_tx, len(init_p["hidden"]),
        len(it_ps[0]["update"]["hidden"]), num_it, w_blk, dtype,
        lp_stencil)
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)
    llr = jnp.stack(outs[:num_tx], axis=1)[:, :, :, :w, :]
    ch = jnp.stack(outs[num_tx:], axis=1)[:, :, :, :w, :]
    return llr, ch


def fused_cgnn_full(params, z0, pe, active_tx, sc_valid=None,
                    num_it: int | None = None,
                    interpret: bool | None = None,
                    lp_stencil: bool | None = None):
    """ONE Pallas kernel for the whole deployed CGNN: init conv stack +
    every iteration + LLR and chest readouts, with the state tensor
    VMEM-resident end to end (the round-4 engine ran init / iteration /
    iteration+readouts as separate kernels, paying an HBM round trip of
    the [b, T, 14, W, d_s] state at each boundary). Whole-grid only —
    needs a raised scoped-vmem budget at the 132-PRB shape
    (NRX_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=98304 measured in
    round 5's offline Mosaic checks).

    params: full CGNN param tree (single-MCS, non-masking, sepconv,
    1-hidden aggregation + readout MLPs — the deployed nrx family).
    z0: [b, T, H, W, C_in] stacked input features (already normalized,
    see cgnn_apply); pe: [T, H, W, 2]; active_tx: [b, T].
    Returns (llr [b, T, H, W, bits], h_hat [b, T, H, W, 2*rx_ant]).
    Matches the reference deployed engine's scope exactly
    (NeuralReceiverONNX.forward, reference neural_rx.py:1773-1812).
    """
    b, t, h, w, _ = z0.shape
    it_ps = params["iterations"]
    num_it = len(it_ps) if num_it is None else num_it
    it_ps = tuple(it_ps[:num_it])
    init_p = params["s_init"][0]
    ro_p = params["readout_llrs"][0]
    ch_p = params["readout_chest"]
    assert len(ro_p["hidden"]) == 1 and len(ch_p["hidden"]) == 1
    for it_p in it_ps:
        assert len(it_p["agg"]["hidden"]) == 1
    vr, _ = _valid_range(sc_valid, w)
    return _fused_cgnn_full_impl(init_p, it_ps, ro_p, ch_p, z0, pe,
                                 active_tx, vr, num_tx=t, num_it=num_it,
                                 interpret=interpret,
                                 lp_stencil=_lp_default(lp_stencil))


def fused_iteration(it_params, s, pe, active_tx, sc_valid=None,
                    w_blk: int | None = None,
                    interpret: bool | None = None,
                    mxu: bool | None = None,
                    lp_stencil: bool | None = None,
                    readout_p=None, chest_p=None):
    """One fused CGNN iteration: drop-in for
    `_update_state(upd, s, _aggregate_user_states(agg, s, ...), pe, ...)`
    (rx/cgnn.cgnn_apply iteration body).

    s: [b, T, H, W, d_s]; pe: [T, H, W, 2]; active_tx: [b, T].
    Returns the next state [b, T, H, W, d_s].

    readout_p (optional, final-iteration serving mode): a 1-hidden-layer
    ReadoutLLRs param tree — the kernel then applies the LLR readout to
    the residual state in VMEM and returns the LLR grid
    [b, T, H, W, num_bits] instead of the state (which never leaves
    VMEM). chest_p (optional, with readout_p): the 1-hidden-layer
    ReadoutChEst param tree — the kernel also applies the chest readout
    in-VMEM and returns (llr, h_hat) with h_hat [b, T, H, W, 2*rx_ant],
    matching the reference's deployed-engine scope (its exported engine
    computes and returns BOTH, reference neural_rx.py:1796-1812)."""
    b, t, h, w, d_s = s.shape
    if w_blk is None:
        w_blk = int(os.environ.get("NRX_ITER_WBLK", "128"))
    if _mxu_default(mxu):
        # measured round 3: folding the 9 taps into the pointwise costs
        # 9x the MXU FLOPs to remove a cheaper VPU stencil — a net loss
        # at these channel widths (and the T-stacked kernel dropped the
        # plumbing). Keep the XLA path for conv_mxu experiments.
        raise ValueError("fused_iteration: conv_mxu is not supported "
                         "(it measured slower; use the XLA path or "
                         "fused_conv_stack for MXU-folded convs)")
    mxu = False
    vr, _ = _valid_range(sc_valid, w)
    if readout_p is not None:
        assert len(readout_p["hidden"]) == 1, "fused readout: 1 hidden"
    if chest_p is not None:
        assert readout_p is not None, "chest_p requires readout_p"
        assert len(chest_p["hidden"]) == 1, "fused chest: 1 hidden"
    return _fused_iteration_impl(it_params["agg"], it_params["update"],
                                 s, pe, active_tx, vr, num_tx=t,
                                 w_blk=w_blk, interpret=interpret,
                                 mxu=_mxu_default(mxu),
                                 lp_stencil=_lp_default(lp_stencil),
                                 readout_p=readout_p, chest_p=chest_p)
