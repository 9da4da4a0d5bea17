"""CGNN neural-receiver core: conv + graph-aggregation network.

TPU-first re-implementation of the reference architecture
(`utils/neural_rx.py:61-595`, original TF design in
`utils/neural_rx copy_pytorch.py` — the fork's lazily-built CGNNIt bug is
NOT replicated; each iteration = AggregateUserStates + UpdateState with a
residual skip, per the original).

Design choices for TPU:
- Functional modules: parameters are plain nested dicts (pytrees), so
  they compose with optax/orbax/pjit without framework glue.
- Channels-last layout [batch*num_tx, sym, sc, ch]: separable 3x3 convs
  lower to depthwise conv + a pointwise matmul that XLA places on the
  MXU; all per-RE MLPs (aggregation, readouts) are matmuls over the
  trailing channel dim.
- The whole forward is shape-static: users/MCS are masked, never
  reshaped (enables PRB-bucketed AOT compilation and grid sharding).
- Optional bf16 compute with f32 parameters (`dtype` argument): matches
  the reference's fp16 TensorRT deployment (nrx_dtype,
  export_onnx.py --fp16).

Architecture constants reproduce the reference exactly; for the nrx_rt
config the parameter count is 142,922 (verified against
weights/nrx_rt_weights: StateInit 28,634 + 2 x (7,288 agg + 41,786
update) + 7,812 LLR readout + 8,328 chest readout).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

# MXU-folded separable-conv lowering for the XLA (training/eval) path;
# per-process, numerically equivalent either way (see _apply_sepconv)
_SEPCONV_FOLDED = os.environ.get("NRX_SEPCONV_FOLDED", "0") == "1"
# (a custom-VJP fused TRAINING sepconv existed through round 3; the
# round-4 on-chip A/B measured it at 64.2 it/s vs 68.8 it/s for the
# folded XLA convs, so it was deleted — folded convs remain the
# training default)


# ---------------------------------------------------------------------------
# Parameter init (Keras-default glorot_uniform kernels, zero biases)
# ---------------------------------------------------------------------------

def _glorot(key, shape, fan_in, fan_out):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _init_sepconv(key, c_in, c_out):
    k1, k2 = jax.random.split(key)
    # depthwise 3x3 (HWIO with feature_group_count=c_in -> [3,3,1,c_in])
    dw = _glorot(k1, (3, 3, 1, c_in), fan_in=9, fan_out=9)
    pw = _glorot(k2, (c_in, c_out), c_in, c_out)
    return {"dw": dw, "pw": pw, "b": jnp.zeros((c_out,), jnp.float32)}


def _init_conv(key, c_in, c_out):
    k1, = jax.random.split(key, 1)
    w = _glorot(k1, (3, 3, c_in, c_out), 9 * c_in, 9 * c_out)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def _init_dense(key, d_in, d_out):
    return {"w": _glorot(key, (d_in, d_out), d_in, d_out),
            "b": jnp.zeros((d_out,), jnp.float32)}


def _init_conv_stack(key, c_in, hidden: Sequence[int], c_out, layer_type):
    keys = jax.random.split(key, len(hidden) + 1)
    init = _init_sepconv if layer_type == "sepconv" else _init_conv
    layers = []
    c = c_in
    for k, n in zip(keys[:-1], hidden):
        layers.append(init(k, c, n))
        c = n
    return {"hidden": layers, "out": init(keys[-1], c, c_out)}


def _init_mlp(key, d_in, hidden: Sequence[int], d_out):
    keys = jax.random.split(key, len(hidden) + 1)
    layers = []
    d = d_in
    for k, n in zip(keys[:-1], hidden):
        layers.append(_init_dense(k, d, n))
        d = n
    return {"hidden": layers, "out": _init_dense(keys[-1], d, d_out)}


# ---------------------------------------------------------------------------
# Layer applications
# ---------------------------------------------------------------------------

def _apply_sepconv(p, x):
    """x: [N, H, W, C] -> [N, H, W, C_out]; depthwise 3x3 + pointwise.

    Two mathematically identical lowerings (fp reorder only):
    - grouped: depthwise conv (feature_group_count=C) then pointwise
      matmul. XLA lowers the grouped conv to the VPU on TPU.
    - folded (NRX_SEPCONV_FOLDED=1): one FULL 3x3 conv whose kernel is
      dw_tap[:, None] * pw — 9x the pointwise FLOPs but MXU-eligible,
      and autodiff reaches dw/pw through the fold for free. Wins when
      the VPU stencil, not the MXU, is the bottleneck (A/B:
      scripts/bench_train_step.py).
    """
    c_in = x.shape[-1]
    dw = p["dw"].astype(x.dtype)
    pw = p["pw"].astype(x.dtype)
    if _SEPCONV_FOLDED:
        k = dw[:, :, 0, :, None] * pw[None, None]  # [3, 3, C, O]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["b"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, dw, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c_in)
    return y @ pw + p["b"].astype(x.dtype)


def _apply_conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def _apply_conv_stack(p, x, layer_type, fused: bool = False,
                      sc_valid=None, mxu: bool | None = None,
                      lp_stencil: bool | None = None):
    """sc_valid (optional int32 scalar): re-zero subcarrier columns >=
    sc_valid after EVERY conv layer. Needed for exact pad-to-bucket
    dispatch: conv biases otherwise make pad-region activations nonzero,
    and the next 3x3 conv bleeds them into the valid region, diverging
    from the direct-shape execution (which sees implicit zero padding at
    the band edge). Both the XLA and the fused-pallas paths honor it."""
    if fused and layer_type == "sepconv":
        # single pallas kernel, activations stay in VMEM (kernels/)
        from ..kernels.sepconv_pallas import fused_conv_stack
        return fused_conv_stack(p, x, sc_valid=sc_valid, mxu=mxu,
                                lp_stencil=lp_stencil)
    f = _apply_sepconv if layer_type == "sepconv" else _apply_conv

    sc_mask = None
    if sc_valid is not None:
        sc_mask = (jnp.arange(x.shape[2]) < sc_valid)[None, None, :, None]

    def m(v):
        return v if sc_mask is None else v * sc_mask.astype(v.dtype)

    for lp in p["hidden"]:
        x = m(jax.nn.relu(f(lp, x)))
    return m(f(p["out"], x))


def _apply_mlp(p, x):
    for lp in p["hidden"]:
        x = jax.nn.relu(x @ lp["w"].astype(x.dtype)
                        + lp["b"].astype(x.dtype))
    return x @ p["out"]["w"].astype(x.dtype) + p["out"]["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# CGNN
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CGNNConfig:
    """Static hyper-parameters (reference [neural_receiver] cfg section)."""
    num_bits_per_symbol: tuple  # one entry per MCS
    num_rx_ant: int
    num_it: int
    d_s: int
    num_units_init: tuple
    num_units_agg: tuple    # per iteration: tuple of hidden sizes
    num_units_state: tuple  # per iteration: tuple of hidden sizes
    num_units_readout: tuple
    layer_type_conv: str = "sepconv"
    var_mcs_masking: bool = False
    initial_chest: bool = True  # h_hat input present
    fused_convs: bool = False   # pallas fused sepconv stacks (kernels/)
    fused_iteration: bool = False  # whole-iteration pallas kernel
    # (aggregation MLP + user sum + concat + update stack in VMEM;
    # serving path only — requires sepconv layers and 1 hidden agg unit)
    fused_iter_wblk: int = 128  # W-block of the fused-iteration kernel
    conv_mxu: bool | None = None  # route separable convs through the
    # MXU (folded-tap matmuls, kernels/sepconv_pallas._sepconv_mxu);
    # None defers to the NRX_CONV_MXU env knob
    stencil_lp: bool | None = None  # accumulate the depthwise stencil
    # in the activation dtype (packed bf16 VPU) instead of f32;
    # None defers to the NRX_STENCIL_LP env knob (serving A/B)
    fused_readout: bool = False  # serving only: apply the LLR + chest
    # readout MLPs inside the FINAL fused-iteration kernel (state never
    # leaves VMEM; single-MCS, non-masking models)
    fused_full: bool = False  # serving only: ONE mega-kernel for the
    # whole CGNN (init stack + every iteration + both readouts,
    # VMEM-resident state end to end; whole-grid, raised scoped-vmem
    # budget — kernels/cgnn_iter_pallas.fused_cgnn_full)

    @property
    def num_mcs(self):
        return len(self.num_bits_per_symbol)

    @property
    def in_channels(self):
        # 2*rx_ant (y re/im) + 2 (pe) + 2*rx_ant (h_hat re/im if present)
        c = 2 * self.num_rx_ant + 2
        if self.initial_chest:
            c += 2 * self.num_rx_ant
        return c


def init_cgnn_params(key, cfg: CGNNConfig):
    keys = jax.random.split(key, 4 + cfg.num_it)
    params = {}
    # State init: one per MCS, or a single shared one (var-MCS masking)
    n_init = 1 if cfg.var_mcs_masking else cfg.num_mcs
    params["s_init"] = [
        _init_conv_stack(jax.random.fold_in(keys[0], i), cfg.in_channels,
                         cfg.num_units_init, cfg.d_s, cfg.layer_type_conv)
        for i in range(n_init)]
    # Iterations
    its = []
    for i in range(cfg.num_it):
        k_a, k_u = jax.random.split(keys[1 + i])
        agg = _init_mlp(k_a, cfg.d_s, cfg.num_units_agg[i], cfg.d_s)
        upd = _init_conv_stack(k_u, 2 * cfg.d_s + 2, cfg.num_units_state[i],
                               cfg.d_s, cfg.layer_type_conv)
        its.append({"agg": agg, "update": upd})
    params["iterations"] = its
    # Readouts
    if cfg.var_mcs_masking:
        params["readout_llrs"] = [_init_mlp(
            keys[-2], cfg.d_s, cfg.num_units_readout,
            max(cfg.num_bits_per_symbol))]
    else:
        params["readout_llrs"] = [
            _init_mlp(jax.random.fold_in(keys[-2], i), cfg.d_s,
                      cfg.num_units_readout, nb)
            for i, nb in enumerate(cfg.num_bits_per_symbol)]
    params["readout_chest"] = _init_mlp(keys[-1], cfg.d_s,
                                        cfg.num_units_readout,
                                        2 * cfg.num_rx_ant)
    return params


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _aggregate_user_states(p, s, active_tx, dtype):
    """GNN message passing (reference neural_rx.py:135-207).

    s: [b, T, sym, sc, d_s]; active_tx: [b, T].
    a_n = (sum_{n' active} sp_{n'} - sp_n) / max(num_active - 1, 1).
    """
    sp = _apply_mlp(p, s)
    mask = active_tx.astype(dtype)[:, :, None, None, None]
    sp = sp * mask
    a = jnp.sum(sp, axis=1, keepdims=True) - sp
    p_cnt = jnp.sum(mask, axis=1, keepdims=True) - 1.0
    p_cnt = jax.nn.relu(p_cnt)  # clip -1 (no active) to 0
    # Divide by max(p_cnt, 1) BEFORE the where: 1/p_cnt at p_cnt==0 is inf
    # and would poison gradients through the dead where branch (classic
    # jnp.where grad hazard).
    scale = jnp.where(p_cnt == 0.0, jnp.asarray(1.0, dtype),
                      1.0 / jnp.maximum(p_cnt, 1.0))
    return a * scale


def _update_state(p, s, a, pe, layer_type, fused: bool = False,
                  sc_valid=None):
    """Conv state update with residual skip (reference :210-270)."""
    b, t = s.shape[0], s.shape[1]
    pe_b = jnp.broadcast_to(pe[None], (b,) + pe.shape)
    z = jnp.concatenate([a, s, pe_b], axis=-1)
    z = z.reshape((b * t,) + z.shape[2:])
    z = _apply_conv_stack(p, z, layer_type, fused, sc_valid)
    return z.reshape((b, t) + z.shape[1:]) + s


def cgnn_apply(params, cfg: CGNNConfig, y, pe, h_hat, active_tx,
               mcs_ue_mask, num_it: int | None = None,
               training: bool = False, apply_multiloss: bool = False,
               dtype=jnp.float32, sc_valid=None):
    """Forward pass (reference CGNN.forward, neural_rx.py:544-595).

    y: [b, sym, sc, 2*rx_ant] real; pe: [T, sym, sc, 2];
    h_hat: [b, T, sym, sc, 2*rx_ant] or None; active_tx: [b, T];
    mcs_ue_mask: [b, T, num_mcs] one-hot.

    sc_valid (optional int32 scalar, traceable): number of valid leading
    subcarriers when the grid is padded to a PRB bucket (deploy/aot).
    When set, the power norm averages over valid REs only and every conv
    layer re-zeros the padded region (in both the XLA and fused-pallas
    conv paths), so the LLRs over the valid subcarriers are identical to
    a direct execution at the valid width (the XLA analog of the
    reference's dynamic-shape TRT profiles, export_onnx.py:147-160).

    Returns (llrs, h_hats): llrs is a list over readout points, each a
    list over MCS of [b, T, sym, sc, num_bits]; h_hats a list of
    [b, T, sym, sc, 2*rx_ant].
    """
    num_it = cfg.num_it if num_it is None else num_it
    assert 1 <= num_it <= cfg.num_it
    b = y.shape[0]
    t = pe.shape[0]
    n_sc = y.shape[2]

    sc_mask = None
    if sc_valid is not None:
        sc_mask = (jnp.arange(n_sc) < sc_valid).astype(
            jnp.float32)[None, None, :, None]
        y = y * sc_mask
        pe = pe * sc_mask
        if h_hat is not None:
            h_hat = h_hat * sc_mask[None]

    # Input power normalization: unit mean power per batch sample
    # (over valid REs only when the grid is bucket-padded)
    mean_sq = jnp.mean(y.astype(jnp.float32) ** 2, axis=(1, 2, 3),
                       keepdims=True)
    if sc_valid is not None:
        mean_sq = mean_sq * (n_sc / sc_valid.astype(jnp.float32))
    norm = jax.lax.rsqrt(mean_sq + 1e-12)
    y = (y * norm).astype(dtype)
    pe = pe.astype(dtype)
    if h_hat is not None:
        h_hat = (h_hat * norm[:, None]).astype(dtype)

    # Stack per-user input: broadcast y to all users
    y_b = jnp.broadcast_to(y[:, None], (b, t) + y.shape[1:])
    pe_b = jnp.broadcast_to(pe[None], (b, t) + pe.shape[1:])
    feats = [y_b, pe_b] + ([h_hat] if h_hat is not None else [])
    z0 = jnp.concatenate(feats, axis=-1)
    z0_flat = z0.reshape((b * t,) + z0.shape[2:])

    if (cfg.fused_full and not training and not apply_multiloss
            and cfg.num_mcs == 1 and not cfg.var_mcs_masking
            and cfg.layer_type_conv == "sepconv"
            and all(len(p["agg"]["hidden"]) == 1
                    for p in params["iterations"][:num_it])
            and len(params["readout_llrs"][0]["hidden"]) == 1
            and len(params["readout_chest"]["hidden"]) == 1):
        # whole-receiver mega-kernel: init + iterations + both readouts
        # in ONE pallas_call, state VMEM-resident throughout — the same
        # (llr, h_hat) scope as the reference's deployed engine
        # (neural_rx.py:1773-1812)
        from ..kernels.cgnn_iter_pallas import fused_cgnn_full
        llr, hh = fused_cgnn_full(params, z0, pe, active_tx, sc_valid,
                                  num_it=num_it,
                                  lp_stencil=cfg.stencil_lp)
        return [[llr.astype(jnp.float32)]], [hh.astype(jnp.float32)]

    def run_init(p):
        s = _apply_conv_stack(p, z0_flat, cfg.layer_type_conv,
                              cfg.fused_convs, sc_valid,
                              mxu=cfg.conv_mxu,
                              lp_stencil=cfg.stencil_lp)
        return s.reshape((b, t) + s.shape[1:])

    if cfg.var_mcs_masking:
        s = run_init(params["s_init"][0])
    else:
        mm = mcs_ue_mask.astype(dtype)
        s = run_init(params["s_init"][0]) * mm[:, :, 0:1][..., None, None]
        for idx in range(1, cfg.num_mcs):
            s = s + (run_init(params["s_init"][idx])
                     * mm[:, :, idx:idx + 1][..., None, None])

    llrs, h_hats = [], []
    from ..kernels.sepconv_pallas import _mxu_default
    if (cfg.fused_iteration and not training
            and _mxu_default(cfg.conv_mxu)
            and cfg.layer_type_conv == "sepconv"
            and all(len(p["agg"]["hidden"]) == 1
                    for p in params["iterations"][:num_it])):
        # conv_mxu (incl. via NRX_CONV_MXU=1 with cfg.conv_mxu=None) is
        # unsupported inside the fused kernel (measured slower, plumbing
        # dropped) — fall back to the XLA path instead of letting the
        # kernel raise at trace time. Warn once, and only when the
        # remaining fused-path preconditions hold (otherwise the fused
        # kernel would be skipped anyway and the warning is noise).
        import warnings
        warnings.warn(
            "fused_iteration requested with conv_mxu resolved "
            "true; conv_mxu is unsupported in the fused kernel "
            "— using the XLA/fconv iteration path instead")
    for i in range(num_it):
        it_p = params["iterations"][i]
        if (cfg.fused_iteration and not training
                and cfg.layer_type_conv == "sepconv"
                and not _mxu_default(cfg.conv_mxu)
                and len(it_p["agg"]["hidden"]) == 1):
            # kernel supports the (universal in the config matrix)
            # 1-hidden-layer aggregation MLP; anything else falls back
            # to the XLA path below. Serving path only: the pallas_call
            # has no custom VJP, so training always takes the XLA path
            from ..kernels.cgnn_iter_pallas import fused_iteration
            if (cfg.fused_readout and i == num_it - 1
                    and not apply_multiloss and cfg.num_mcs == 1
                    and not cfg.var_mcs_masking
                    and len(params["readout_llrs"][0]["hidden"]) == 1
                    and len(params["readout_chest"]["hidden"]) == 1):
                # BOTH readouts (LLR + chest) run inside the kernel on
                # the in-VMEM final state — the same scope as the
                # reference's deployed engine, whose exported graph
                # computes and returns (llr, h_hat)
                # (NeuralReceiverONNX.forward, neural_rx.py:1796-1812)
                llr, h_hat = fused_iteration(
                    it_p, s, pe, active_tx, sc_valid,
                    w_blk=cfg.fused_iter_wblk, mxu=cfg.conv_mxu,
                    lp_stencil=cfg.stencil_lp,
                    readout_p=params["readout_llrs"][0],
                    chest_p=params["readout_chest"])
                llrs.append([llr.astype(jnp.float32)])
                h_hats.append(h_hat.astype(jnp.float32))
                return llrs, h_hats
            s = fused_iteration(it_p, s, pe, active_tx, sc_valid,
                                w_blk=cfg.fused_iter_wblk,
                                mxu=cfg.conv_mxu,
                                lp_stencil=cfg.stencil_lp)
        else:
            a = _aggregate_user_states(it_p["agg"], s, active_tx, dtype)
            if sc_mask is not None:
                # pad columns carry MLP(0) = bias-propagated junk (s is
                # re-zeroed per conv layer, but the aggregation MLP is
                # not); the update stack's first 3x3 conv would bleed it
                # into the last valid column, diverging from direct-
                # width execution
                a = a * sc_mask[None].astype(a.dtype)
            s = _update_state(it_p["update"], s, a, pe,
                              cfg.layer_type_conv, cfg.fused_convs,
                              sc_valid)
        if (training and apply_multiloss) or i == num_it - 1:
            per_mcs = []
            for idx in range(cfg.num_mcs):
                if cfg.var_mcs_masking:
                    out = _apply_mlp(params["readout_llrs"][0], s)
                    out = out[..., :cfg.num_bits_per_symbol[idx]]
                else:
                    out = _apply_mlp(params["readout_llrs"][idx], s)
                per_mcs.append(out.astype(jnp.float32))
            llrs.append(per_mcs)
            h_hats.append(_apply_mlp(params["readout_chest"], s)
                          .astype(jnp.float32))
    return llrs, h_hats


# ---------------------------------------------------------------------------
# Positional encoding precompute (reference CGNNOFDM, neural_rx.py:693-802)
# ---------------------------------------------------------------------------

def pilot_positional_encoding(dmrs_grids: np.ndarray,
                              pilot_mask: np.ndarray) -> np.ndarray:
    """2-D positional encoding: z-scored distance to the nearest own pilot.

    dmrs_grids: [num_tx, sym, sc] complex (one slot's DMRS bank entry).
    pilot_mask: [sym, sc] bool (union mask; unused beyond shape — kept for
    interface clarity with the grid).
    Returns [num_tx, sym, sc, 2] float32 (time-dist, freq-dist), each
    z-scored per the reference: time over the symbol axis per (tx, sc),
    freq over the subcarrier axis per (tx, sym).
    """
    num_tx, n_sym, n_sc = dmrs_grids.shape
    out = np.zeros((num_tx, n_sym, n_sc, 2), np.float32)
    for tx in range(num_tx):
        ip, jp = np.where(np.abs(dmrs_grids[tx]) > 1e-3)
        dt = np.abs(np.arange(n_sym)[:, None, None] - ip[None, None, :])
        df = np.abs(np.arange(n_sc)[None, :, None] - jp[None, None, :])
        nearest_t = dt.min(-1).astype(np.float64)  # [sym, 1] broadcast
        nearest_t = np.broadcast_to(nearest_t, (n_sym, n_sc)).astype(
            np.float64).copy()
        nearest_f = np.broadcast_to(df.min(-1), (n_sym, n_sc)).astype(
            np.float64).copy()
        # z-score: time over symbols (axis 0), freq over subcarriers (ax 1)
        nearest_t -= nearest_t.mean(axis=0, keepdims=True)
        std = nearest_t.std(axis=0, keepdims=True)
        nearest_t = np.where(std > 0, nearest_t / np.where(std > 0, std, 1),
                             nearest_t)
        nearest_f -= nearest_f.mean(axis=1, keepdims=True)
        std = nearest_f.std(axis=1, keepdims=True)
        nearest_f = np.where(std > 0, nearest_f / np.where(std > 0, std, 1),
                             nearest_f)
        out[tx, ..., 0] = nearest_t
        out[tx, ..., 1] = nearest_f
    return out
