"""Trainable fused separable-conv stack: pallas forward AND backward.

The round-3 training-step trace (scripts/analyze_trace.py
logs/traces/train) attributes ~20% of the 14.7 ms step to XLA layout
copies sandwiching the f32 convs, and ~8% to the depthwise
weight-gradient fusions — both artifacts of expressing the sepconv
stack as XLA conv ops. This module gives the stack a custom VJP whose
forward and input-gradient passes are single pallas kernels (batch-
blocked, activations VMEM-resident across the stack), replacing the
round-2 serving-only limitation (reference training loop analog:
utils/utils.py:238-326 — the hot compiled step).

Scheme (per layer l: depthwise 3x3 dw_l, pointwise pw_l, bias b_l,
ReLU on hidden layers):

  forward:  acc_l = dw3x3(x_l, dw_l); z_l = acc_l @ pw_l + b_l;
            x_{l+1} = relu(z_l) (hidden) | z_l (out).
            Saves every layer input x_l (the ReLU mask of layer l is
            x_{l+1} > 0, so no extra activations are stored).
  backward: dz_l = dy_l * mask_l
            d_b_l  = sum dz_l
            d_pw_l = dw3x3(x_l, dw_l)^T @ dz_l        (acc recomputed)
            d_acc  = dz_l @ pw_l^T
            d_dw_l[s] = sum shift_s(x_l) * d_acc      (9 taps, per C)
            dy_{l-1} = dw3x3(d_acc, flip(dw_l))       (transposed conv)

Both passes run on a (batch-blocks,) grid; weight gradients accumulate
across the sequential TPU grid steps into constant-index output blocks.
Matmul operands are rounded to `mm_dtype` (bf16 on TPU — the same
rounding class as XLA's TPU f32-conv lowering) with f32 accumulation;
the stencils accumulate in f32.

Enable in training via NRX_FUSED_TRAIN=1 (rx/cgnn._apply_conv_stack);
default remains the XLA path until the on-chip step A/B
(scripts/bench_train_step.py --fused-train).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv_pallas import _dw3x3, _flatten_weights


def _dw3x3_flip(x, dw):
    """Transposed-depthwise: correlate with the 180-degree-rotated
    taps (the VJP of _dw3x3 wrt its input). Static-index flip — jnp
    [::-1] lowers to `rev`, unimplemented in Pallas TPU."""
    return _dw3x3(x, dw, flip=True)


def _fwd_kernel(n_hidden, mm_dtype, x_ref, *refs):
    """refs: (dw, pw, b) per layer, then outputs: per-layer saved
    inputs x_0..x_{L-1} (L = n_hidden+1) and the final output y."""
    n_layers = n_hidden + 1
    wrefs = refs[:3 * n_layers]
    save_refs = refs[3 * n_layers:3 * n_layers + n_layers]
    out_ref = refs[-1]
    x = x_ref[...]
    for li in range(n_layers):
        save_refs[li][...] = x
        dw = wrefs[3 * li][...]
        pw = wrefs[3 * li + 1][...]
        b = wrefs[3 * li + 2][...]
        acc = _dw3x3(x, dw)  # f32 [B, H, W, C]
        sh = acc.shape
        y = jax.lax.dot_general(
            acc.reshape(-1, sh[-1]).astype(mm_dtype),
            pw.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b.astype(jnp.float32)[None, :]
        if li < n_hidden:
            y = jnp.maximum(y, 0.0)
        x = y.reshape(sh[:-1] + (-1,)).astype(x_ref.dtype)
    out_ref[...] = x


def _bwd_kernel(n_hidden, mm_dtype, dy_ref, *refs):
    """refs: (dw, pw) per layer, per-layer saved inputs, then outputs:
    dx, and accumulated (d_dw [3,3,C], d_pw [C,O], d_b [O]) per layer.
    Weight-grad outputs have constant index maps: each sequential grid
    step adds its block's contribution."""
    n_layers = n_hidden + 1
    wrefs = refs[:2 * n_layers]
    save_refs = refs[2 * n_layers:2 * n_layers + n_layers]
    dx_ref = refs[2 * n_layers + n_layers]
    grad_refs = refs[2 * n_layers + n_layers + 1:]
    first = pl.program_id(0) == 0

    dy = dy_ref[...].astype(jnp.float32)  # [B, H, W, O]
    for li in range(n_layers - 1, -1, -1):
        dw = wrefs[2 * li][...]
        pw = wrefs[2 * li + 1][...]
        x_l = save_refs[li][...]
        if li < n_hidden:
            # saved x_{l+1} is relu(z_l); its positives mark dz passthru.
            # x_{l+1} = the NEXT layer's saved input
            mask = (save_refs[li + 1][...] > 0)
            dz = jnp.where(mask, dy, 0.0)
        else:
            dz = dy
        sh = x_l.shape
        dz2 = dz.reshape(-1, dz.shape[-1])                 # [N, O]
        d_b = jnp.sum(dz2, axis=0)                         # [O]
        acc = _dw3x3(x_l, dw)                              # [B,H,W,C] f32
        acc2 = acc.reshape(-1, acc.shape[-1])
        d_pw = jax.lax.dot_general(                        # [C, O]
            acc2.astype(mm_dtype), dz2.astype(mm_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_acc = jax.lax.dot_general(                       # [N, C]
            dz2.astype(mm_dtype), pw.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_acc = d_acc.reshape(sh).astype(jnp.float32)
        # d_dw: 9 shifted elementwise reductions — sum(shift_s(x) *
        # d_acc) == sum(x * shift_{-s}(d_acc)). Pad d_acc ONCE and take
        # 9 static slices (9 separate padded copies blew scoped VMEM).
        dap = _pad_hw(d_acc)
        x32 = x_l.astype(jnp.float32)
        red_axes = tuple(range(x_l.ndim - 1))
        ha, wa = x_l.ndim - 3, x_l.ndim - 2
        h_, w_ = x_l.shape[ha], x_l.shape[wa]
        d_dw_taps = []
        for dy_ in (-1, 0, 1):
            row = []
            for dx_ in (-1, 0, 1):
                start = [0] * x_l.ndim
                start[ha], start[wa] = 1 - dy_, 1 - dx_
                lim = list(x_l.shape)
                lim[ha], lim[wa] = 1 - dy_ + h_, 1 - dx_ + w_
                shifted = jax.lax.slice(dap, start, lim)
                row.append(jnp.sum(x32 * shifted, axis=red_axes))
            d_dw_taps.append(row)
        d_dw = jnp.stack([jnp.stack(r, 0) for r in d_dw_taps], 0)
        gi = 3 * li

        @pl.when(first)
        def _init():
            grad_refs[gi][...] = d_dw.astype(grad_refs[gi].dtype)
            grad_refs[gi + 1][...] = d_pw.astype(grad_refs[gi + 1].dtype)
            grad_refs[gi + 2][...] = d_b.astype(grad_refs[gi + 2].dtype)

        @pl.when(jnp.logical_not(first))
        def _acc():
            grad_refs[gi][...] += d_dw.astype(grad_refs[gi].dtype)
            grad_refs[gi + 1][...] += d_pw.astype(grad_refs[gi + 1].dtype)
            grad_refs[gi + 2][...] += d_b.astype(grad_refs[gi + 2].dtype)

        dy = _dw3x3_flip(d_acc, dw)  # [B,H,W,C] f32 -> next lower layer
    dx_ref[...] = dy.astype(dx_ref.dtype)


def _pad_hw(x):
    """Concat-based 1-element zero border on the (H, W) axes."""
    ha, wa = x.ndim - 3, x.ndim - 2
    zc_shape = list(x.shape)
    zc_shape[wa] = 1
    xp = jnp.concatenate(
        [jnp.zeros(zc_shape, x.dtype), x, jnp.zeros(zc_shape, x.dtype)],
        axis=wa)
    zr_shape = list(xp.shape)
    zr_shape[ha] = 1
    return jnp.concatenate(
        [jnp.zeros(zr_shape, x.dtype), xp, jnp.zeros(zr_shape, x.dtype)],
        axis=ha)


def _weights_list(p):
    return list(p["hidden"]) + [p["out"]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sepconv_stack_train(p, x, b_blk=8, mm_dtype=None,
                        interpret: bool | None = None):
    """Differentiable fused sepconv stack. p: {hidden: [(dw,pw,b)...],
    out: (dw,pw,b)} with dw [3,3,1,C]; x: [N, H, W, C_in].
    ReLU after hidden layers, linear output (rx/cgnn semantics)."""
    y, _ = _fwd_impl(p, x, b_blk, mm_dtype, interpret)
    return y


def _resolve(x, b_blk, mm_dtype, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if mm_dtype is None:
        mm_dtype = x.dtype
    n = x.shape[0]
    b_blk = min(b_blk, n)
    assert n % b_blk == 0, (n, b_blk)
    return b_blk, mm_dtype, interpret


def _fwd_impl(p, x, b_blk, mm_dtype, interpret):
    b_blk, mm_dtype, interpret = _resolve(x, b_blk, mm_dtype, interpret)
    layers = _weights_list(p)
    n, h, w, _ = x.shape
    dtype = x.dtype
    widths = [lp["pw"].shape[0] for lp in layers]
    c_out = layers[-1]["pw"].shape[1]
    ops, specs = _flatten_weights(layers, dtype)

    blk = lambda c: pl.BlockSpec(  # noqa: E731
        (b_blk, h, w, c), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((n, h, w, c), dtype)
                   for c in widths]
                  + [jax.ShapeDtypeStruct((n, h, w, c_out), dtype)])
    out_specs = [blk(c) for c in widths] + [blk(c_out)]

    kernel = functools.partial(_fwd_kernel, len(p["hidden"]), mm_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(n // b_blk,),
        in_specs=[blk(x.shape[-1])] + specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *ops)
    saved, y = outs[:-1], outs[-1]
    return y, tuple(saved)


def _vjp_fwd(p, x, b_blk, mm_dtype, interpret):
    y, saved = _fwd_impl(p, x, b_blk, mm_dtype, interpret)
    return y, (p, saved)


def _vjp_bwd(b_blk, mm_dtype, interpret, res, dy):
    p, saved = res
    x_shape, x_dtype = saved[0].shape, saved[0].dtype
    b_blk, mm_dtype, interpret = _resolve(
        jax.ShapeDtypeStruct(x_shape, x_dtype), b_blk, mm_dtype,
        interpret)
    layers = _weights_list(p)
    n, h, w, c_in = x_shape
    n_layers = len(layers)

    ops, specs = [], []
    for lp in layers:
        for a in (lp["dw"][:, :, 0, :], lp["pw"]):
            ops.append(a)
            specs.append(pl.BlockSpec(
                a.shape, lambda *_i, _s=a.shape: (0,) * len(_s),
                memory_space=pltpu.VMEM))

    blk = lambda c, dt=None: pl.BlockSpec(  # noqa: E731
        (b_blk, h, w, c), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, _s=shape: (0,) * len(_s),
        memory_space=pltpu.VMEM)

    save_specs = [blk(s.shape[-1]) for s in saved]
    out_specs = [blk(c_in)]
    out_shapes = [jax.ShapeDtypeStruct(x_shape, x_dtype)]
    for lp in layers:
        c, o = lp["pw"].shape
        out_specs += [const((3, 3, c)), const((c, o)), const((o,))]
        out_shapes += [jax.ShapeDtypeStruct((3, 3, c), jnp.float32),
                       jax.ShapeDtypeStruct((c, o), jnp.float32),
                       jax.ShapeDtypeStruct((o,), jnp.float32)]

    kernel = functools.partial(_bwd_kernel, n_layers - 1, mm_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(n // b_blk,),
        in_specs=[blk(dy.shape[-1])] + specs + save_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(dy, *ops, *saved)
    dx = outs[0]
    grads = outs[1:]
    d_layers = []
    for li in range(n_layers):
        d_dw, d_pw, d_b = grads[3 * li:3 * li + 3]
        dt = layers[li]["dw"].dtype
        d_layers.append({"dw": d_dw[:, :, None, :].astype(dt),
                         "pw": d_pw.astype(layers[li]["pw"].dtype),
                         "b": d_b.astype(layers[li]["b"].dtype)})
    dp = {"hidden": d_layers[:-1], "out": d_layers[-1]}
    return dp, dx


sepconv_stack_train.defvjp(_vjp_fwd, _vjp_bwd)
