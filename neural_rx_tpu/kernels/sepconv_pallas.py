"""Fused separable-conv stack as a single Pallas TPU kernel.

The CGNN's hot path is a stack of 3x3 separable convs over the resource
grid (reference StateInit/UpdateState, neural_rx.py:61-132/210-270).
The XLA path (`rx/cgnn.py:_apply_conv_stack`) emits one depthwise conv,
one pointwise matmul and an elementwise epilogue per layer, with the
inter-layer activations round-tripping through HBM. This kernel keeps
the whole stack's activations resident in VMEM:

- depthwise 3x3 ("SAME", cross-correlation like XLA) as 9 masked
  roll-multiply-accumulates on the VPU, f32 accumulation;
- pointwise as an MXU matmul over [H*W, C] with f32 accumulation;
- bias + ReLU epilogues fused in-register;
- grid over the batch axis, one slot's grid per step (at the real-time
  shape 14x1584 the bf16 activations are ~5.7 MB/layer — the 3-layer
  stack fits VMEM; wider shapes need the W-blocked variant, round 2).

Activations enter and leave in the caller's dtype (bf16 on TPU); all
accumulation is f32, matching the XLA conv/dot defaults.

Enable via CGNNConfig(fused_convs=True) (rx/cgnn.py); default remains
the XLA path until the kernel is profiled on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw3x3(x, dw, lp_stencil=False, flip=False):
    """Depthwise 3x3 SAME cross-correlation. x: [H, W, C]; dw: [3,3,C].
    Returns f32 [H, W, C] (or x.dtype when lp_stencil).

    Implemented as 9 static slices of a zero-padded copy (NOT jnp.roll:
    roll lowers to a concatenate that includes a zero-width slice when a
    shift is 0, and Mosaic rejects zero-sized vectors — this failed to
    compile on real TPU while passing in interpret mode).

    lp_stencil=True accumulates the 9 taps in the activation dtype
    (packed bf16 VPU ops on TPU, half the vector-register traffic) —
    an opt-in speed/precision experiment for serving.

    x may also be [T, H, W, C]: the stencil vectorizes over the leading
    axis in single ops (each T image zero-padded independently), which
    halves the per-layer op count for multi-user stacks."""
    lead = x.ndim == 4
    h, w, c = x.shape[-3:]
    acc_dtype = x.dtype if lp_stencil else jnp.float32
    ha, wa = x.ndim - 3, x.ndim - 2
    pad = [(0, 0)] * x.ndim
    pad[ha] = (1, 1)
    pad[wa] = (1, 1)
    # concat-based zero padding (NOT jnp.pad inside a kernel: identical
    # lowering, kept explicit for Mosaic-compatibility parity with the
    # original 3D path)
    zc_shape = list(x.shape)
    zc_shape[wa] = 1
    xp = jnp.concatenate(
        [jnp.zeros(zc_shape, x.dtype), x, jnp.zeros(zc_shape, x.dtype)],
        axis=wa)
    zr_shape = list(xp.shape)
    zr_shape[ha] = 1
    xp = jnp.concatenate(
        [jnp.zeros(zr_shape, x.dtype), xp, jnp.zeros(zr_shape, x.dtype)],
        axis=ha)
    acc = jnp.zeros(x.shape, acc_dtype)
    kb = (None,) * (x.ndim - 1)  # broadcast dims for the tap vector
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # y[i,j] += x[i+dy, j+dx] * k[dy+1, dx+1]  (zero outside)
            start = [0] * x.ndim
            start[ha] = 1 + dy
            start[wa] = 1 + dx
            lim = list(x.shape)
            lim[ha] = 1 + dy + h
            lim[wa] = 1 + dx + w
            if lead:
                lim[0] = x.shape[0]
            shifted = jax.lax.slice(xp, start, lim)
            # flip: 180-degree-rotated taps (transposed conv / input
            # VJP) via STATIC indexing — jnp flip lowers to `rev`,
            # which Pallas TPU does not implement
            ky, kx = (1 - dy, 1 - dx) if flip else (dy + 1, dx + 1)
            kvec = dw[ky, kx].astype(acc_dtype)
            acc = acc + shifted.astype(acc_dtype) * kvec[kb]
    return acc


def _sepconv_mxu(x, dw, pw):
    """Separable 3x3 conv with ALL multiply-accumulates on the MXU.
    x: [H, W, C] -> f32 [H*W, O].

    Folds each tap's diagonal depthwise scale into the pointwise matrix
    (out = sum_s shift_s(x) @ (diag(dw_s) @ pw)): nine bf16 MXU matmuls
    with a shared f32 accumulator replace the VPU 9-tap f32 stencil plus
    one f32 MXU matmul of `_dw3x3` + pointwise. The depthwise stencil is
    VPU-bound (9 f32 MACs/element) while the MXU sits idle; trading it
    for 9x the (tiny) pointwise MXU work wins when C is small. Uses the
    same zero-padded static slices as _dw3x3, so edge semantics are
    bit-identical SAME-conv; the folded weights round to bf16 (same
    order of rounding as the bf16 activations)."""
    h, w, c = x.shape
    zc = jnp.zeros((h, 1, c), x.dtype)
    xp = jnp.concatenate([zc, x, zc], axis=1)
    zr = jnp.zeros((1, w + 2, c), x.dtype)
    xp = jnp.concatenate([zr, xp, zr], axis=0)
    pw32 = pw.astype(jnp.float32)
    acc = jnp.zeros((h * w, pw.shape[1]), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sh = jax.lax.slice(
                xp, (1 + dy, 1 + dx, 0), (1 + dy + h, 1 + dx + w, c))
            ws = (dw[dy + 1, dx + 1].astype(jnp.float32)[:, None]
                  * pw32).astype(x.dtype)
            acc = acc + jax.lax.dot_general(
                sh.reshape(h * w, c), ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _run_stack(x, wrefs, n_hidden, out_dtype, in_grid=None, mxu=False,
               lp_stencil=False):
    """Shared layer loop: depthwise (VPU) -> pointwise (MXU) -> bias,
    ReLU on hidden layers. wrefs: (dw [3,3,C], pw [C,O], b [O]) per
    layer. in_grid ([1, W, 1] bool or None): out-of-grid columns to
    re-zero before EVERY layer (blocked variant; the pointwise bias +
    ReLU makes padding non-zero after one layer, while "SAME" semantics
    pad with zeros at each layer). mxu=True routes the whole separable
    conv through the MXU (see _sepconv_mxu)."""
    assert not (mxu and x.ndim == 4), "mxu path is 3D-only"
    for li in range(n_hidden + 1):
        if in_grid is not None:
            # in_grid is [1, W, 1]: right-aligned broadcast also covers
            # a leading multi-user axis ([T, H, W, C])
            x = jnp.where(in_grid, x, 0).astype(x.dtype)
        dw = wrefs[3 * li][:]
        pw = wrefs[3 * li + 1][:]
        b = wrefs[3 * li + 2][:]
        c = x.shape[-1]
        if mxu:
            h, w, _ = x.shape
            y = _sepconv_mxu(x, dw, pw)
        else:
            acc = _dw3x3(x, dw, lp_stencil)  # [..., H, W, C] f32 (or lp)
            # Round the depthwise accumulator back to the activation
            # dtype for the pointwise matmul: with bf16 activations a
            # f32xf32 dot here runs the MXU in its (several-fold
            # slower) f32 passes, while the XLA conv path it replaces
            # is a bf16 MXU op with f32 accumulation — identical
            # rounding class, so match it (measured round 3: the f32
            # dots were the largest single cost of the fused path).
            y = jax.lax.dot_general(
                acc.reshape(-1, c).astype(x.dtype),
                pw.astype(x.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = y + b.astype(jnp.float32)[None, :]
        if li < n_hidden:
            y = jnp.maximum(y, 0.0)
        x = y.reshape(x.shape[:-1] + (-1,)).astype(out_dtype)
    if in_grid is not None:  # out layer's pad columns zeroed as well
        x = jnp.where(in_grid, x, 0).astype(x.dtype)
    return x


def _flatten_weights(layers, dtype):
    """Per-layer (dw, pw, b) arrays + whole-array VMEM BlockSpecs."""
    ops, specs = [], []
    for lp in layers:
        for a in (lp["dw"][:, :, 0, :].astype(dtype),
                  lp["pw"].astype(dtype), lp["b"].astype(dtype)):
            ops.append(a)
            specs.append(pl.BlockSpec(
                a.shape, lambda *_i, _s=a.shape: (0,) * len(_s),
                memory_space=pltpu.VMEM))
    return ops, specs


def _stack_kernel(n_hidden, out_dtype, w_static, mxu, lp_stencil,
                  valid_ref, x_ref, *refs):
    """refs: (dw, pw, b) per layer (hidden... then out), then out_ref.
    valid_ref (SMEM [2]): the [lo, hi) valid W-column range; columns
    outside it are re-zeroed before every layer and after the last
    (exact pad-to-bucket / shard-halo semantics, see
    rx/cgnn._apply_conv_stack and dist/fused_sharded.py)."""
    out_ref = refs[-1]
    in_grid = None
    if w_static is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, w_static, 1), 1)
        in_grid = (col >= valid_ref[0]) & (col < valid_ref[1])
    out_ref[0] = _run_stack(x_ref[0], refs[:-1], n_hidden, out_dtype,
                            in_grid=in_grid, mxu=mxu,
                            lp_stencil=lp_stencil)


def _valid_range(sc_valid, w):
    """Normalize the valid-column spec to an int32 [lo, hi) pair.
    Accepts None (full width), a scalar (leading-valid count), or an
    explicit (lo, hi) pair. Returns (array [2], masked: bool)."""
    if sc_valid is None:
        return jnp.asarray([0, w], jnp.int32), False
    sc_valid = jnp.asarray(sc_valid, jnp.int32)
    if sc_valid.ndim == 0:
        return jnp.stack([jnp.int32(0), sc_valid]), True
    assert sc_valid.shape == (2,)
    return sc_valid, True


def _interpret_default(interpret):
    """None -> interpret off-TPU (CPU tests / virtual-mesh dryruns) —
    UNLESS NRX_FORCE_MOSAIC=1: offline AOT compilation via the v5e
    topology client runs with default_backend()=="cpu" while targeting
    real TPU, and silently interpret-lowering there ships an engine
    artifact with NO Mosaic kernels in it (caught in round 5: the
    'mega' engine compiled in 10 s instead of minutes)."""
    if interpret is not None:
        return interpret
    if os.environ.get("NRX_FORCE_MOSAIC") == "1":
        return False
    return jax.default_backend() == "cpu"


def _mxu_default(mxu):
    """None -> env opt-in NRX_CONV_MXU=1 (chip A/B knob)."""
    if mxu is None:
        return os.environ.get("NRX_CONV_MXU", "0") == "1"
    return bool(mxu)


def _lp_default(lp_stencil):
    """None -> env opt-in NRX_STENCIL_LP=1 (chip A/B knob)."""
    if lp_stencil is None:
        return os.environ.get("NRX_STENCIL_LP", "0") == "1"
    return bool(lp_stencil)


def fused_conv_stack(p, x, interpret: bool | None = None, sc_valid=None,
                     mxu: bool | None = None,
                     lp_stencil: bool | None = None):
    """Drop-in for `_apply_conv_stack(p, x, "sepconv")`: ReLU after each
    hidden layer, linear output layer. x: [N, H, W, C_in].

    sc_valid (optional): leading-valid column count, or an explicit
    (lo, hi) pair — columns outside the valid range (bucket padding /
    shard halos at a band edge) are re-zeroed per layer so results match
    a direct-width run.

    Dispatches to the W-blocked overlap-save variant when the
    whole-grid VMEM working set would be too large (wide grids, f32).

    interpret=None auto-selects pallas interpret mode off-TPU (CPU runs
    of the fused path, e.g. tests and the virtual-mesh dryrun)."""
    n, h, w, c_in = x.shape
    widths = [c_in] + [lp["pw"].shape[1] for lp in p["hidden"]]
    widths.append(p["out"]["pw"].shape[1])
    vr, masked = _valid_range(sc_valid, w)
    # input + widest intermediate (held twice across a layer boundary)
    per_re = (c_in + 2 * max(widths)) * x.dtype.itemsize
    # whole-grid budget: ~10 MB of the default 16 MB scoped VMEM;
    # raise via NRX_STACK_WHOLE_MB together with a raised
    # --xla_tpu_scoped_vmem_limit_kib to keep wide grids halo-free
    # (A/B'd alongside the whole-grid fused iteration, round 4)
    whole_mb = int(os.environ.get("NRX_STACK_WHOLE_MB", "10"))
    if h * w * per_re > whole_mb * 2**20:
        return fused_conv_stack_blocked(p, x, interpret=interpret,
                                        sc_valid=vr, mxu=mxu,
                                        lp_stencil=lp_stencil)
    return _fused_conv_stack_whole(p, x, vr, masked, interpret=interpret,
                                   mxu=_mxu_default(mxu),
                                   lp_stencil=_lp_default(lp_stencil))


@functools.partial(jax.jit,
                   static_argnames=("masked", "interpret", "mxu",
                                    "lp_stencil"))
def _fused_conv_stack_whole(p, x, sc_valid, masked: bool,
                            interpret: bool | None = None,
                            mxu: bool = False, lp_stencil: bool = False):
    interpret = _interpret_default(interpret)
    layers = list(p["hidden"]) + [p["out"]]
    n, h, w, _ = x.shape
    c_out = layers[-1]["pw"].shape[1]
    dtype = x.dtype

    ops, specs = _flatten_weights(layers, dtype)
    kernel = functools.partial(_stack_kernel, len(p["hidden"]), dtype,
                               w if masked else None, mxu, lp_stencil)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, h, w, x.shape[-1]),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, h, w, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), dtype),
        interpret=interpret,
    )(sc_valid, x, *ops)


# ---------------------------------------------------------------------------
# W-blocked variant: for grids/channel-counts where whole-grid residency
# would blow VMEM (the 130-channel update stacks at 132 PRB, and any
# grid beyond ~200 PRB). Overlap-save over the subcarrier axis with a 2D
# (batch, W-block) grid: each step fetches the current W block plus its
# two neighbors through ordinary BlockSpec pipelining (the Pallas
# pipeline double-buffers these HBM->VMEM copies automatically),
# concatenates the halo columns in VMEM, runs the whole conv stack, and
# writes back the core w_blk columns. Buffer-edge columns corrupted by
# the shifts fall inside the discarded halo; true grid edges see the
# host's zero padding — identical "SAME" semantics to the XLA path.
#
# Manual make_async_copy DMA is deliberately NOT used here: on real TPU
# it requires tile-aligned copy extents (sublane multiple of 8, lane
# multiple of 128 once >128) and crashed the Mosaic compiler for the
# 130-channel / halo-extended windows this kernel needs
# (scripts/debug_blocked_bisect*.py); BlockSpec-managed fetches handle
# those shapes. The halo slices taken from the neighbor fetches must be
# sublane-aligned (width multiple of 8): unaligned slices from multiple
# refs combined into one concatenate also crash Mosaic (same bisect
# scripts), so the fetch halo is the conv halo rounded up to 8.
# ---------------------------------------------------------------------------


def _stack_kernel_blocked(n_hidden, halo, w_blk, out_dtype, mxu,
                          lp_stencil, valid_ref,
                          left_ref, mid_ref, right_ref, *refs):
    """Grid (batch, W-block). left/mid/right: [1, H, w_blk, C] fetches
    of consecutive W blocks (the extended array is offset one full block,
    so mid == block wb of the true grid). valid_ref (SMEM [2]): the
    [lo, hi) valid true-column range (== full grid for plain runs;
    narrower under pad-to-bucket dispatch)."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    wb = pl.program_id(1)
    lo, hi = valid_ref[0], valid_ref[1]
    w_ext = w_blk + 2 * halo

    xw = jnp.concatenate(
        [left_ref[0, :, w_blk - halo:, :], mid_ref[0],
         right_ref[0, :, :halo, :]], axis=1)
    # true-grid column of each buffer column (for per-layer pad
    # re-zeroing in _run_stack)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, w_ext, 1), 1)
           + wb * w_blk - halo)
    x = _run_stack(xw, wrefs, n_hidden, out_dtype,
                   in_grid=(col >= lo) & (col < hi), mxu=mxu,
                   lp_stencil=lp_stencil)
    out_ref[0] = x[:, halo:halo + w_blk, :]


@functools.partial(jax.jit,
                   static_argnames=("w_blk", "interpret", "mxu",
                                    "lp_stencil"))
def fused_conv_stack_blocked(p, x, w_blk: int = 256,
                             interpret: bool | None = None,
                             sc_valid=None, mxu: bool | None = None,
                             lp_stencil: bool | None = None):
    """W-blocked `fused_conv_stack` for wide grids. x: [N, H, W, C_in];
    W is padded up to a multiple of w_blk internally (zero columns, then
    cropped), so any subcarrier count works. sc_valid: see
    fused_conv_stack (defaults to the full width)."""
    interpret = _interpret_default(interpret)
    mxu = _mxu_default(mxu)
    lp_stencil = _lp_default(lp_stencil)
    layers = list(p["hidden"]) + [p["out"]]
    # conv halo = one column per layer, rounded up to a sublane multiple
    # (8) so the neighbor-fetch slices below are Mosaic-legal
    halo = -(-len(layers) // 8) * 8
    n, h, w, c_in = x.shape
    c_out = layers[-1]["pw"].shape[1]
    dtype = x.dtype
    sc_valid, _ = _valid_range(sc_valid, w)
    assert halo <= w_blk

    n_wb = -(-w // w_blk)
    w_pad = n_wb * w_blk
    # no side zero blocks: edge blocks fetch a clamped neighbor and the
    # out-of-grid halo columns are re-zeroed by the kernel's in_grid
    # mask before every layer (same trick as _fused_iteration_impl —
    # saves 2*w_blk zero columns of HBM writes per call)
    x_ext = jnp.pad(x, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))

    ops, specs = _flatten_weights(layers, dtype)
    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (1, h, w_blk, c_in),
        lambda i, wb, _o=off: (i, 0, jnp.clip(wb + _o - 1, 0, n_wb - 1),
                               0),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_stack_kernel_blocked, len(p["hidden"]),
                               halo, w_blk, dtype, mxu, lp_stencil)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_wb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(0), blk(1), blk(2)] + specs,
        out_specs=pl.BlockSpec((1, h, w_blk, c_out),
                               lambda i, wb: (i, 0, wb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_pad, c_out), dtype),
        interpret=interpret,
    )(sc_valid, x_ext, x_ext, x_ext, *ops)
    return out[:, :, :w, :]
