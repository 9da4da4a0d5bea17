"""Fused sepconv-stack pallas kernel vs the XLA reference path
(interpret mode on CPU; numeric parity in f32)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_rx_tpu.rx.cgnn import _init_conv_stack, _apply_conv_stack
from neural_rx_tpu.kernels.sepconv_pallas import fused_conv_stack


@pytest.mark.parametrize("shape,cin,hidden,cout", [
    ((2, 14, 48, 18), 18, [128, 128], 56),   # nrx_rt state-init stack
    ((1, 14, 48, 114), 114, [128, 128], 56),  # nrx_rt update stack
    ((3, 7, 36, 10), 10, [32], 8),            # odd sizes
])
def test_matches_xla_stack(shape, cin, hidden, cout):
    key = jax.random.PRNGKey(0)
    p = _init_conv_stack(key, cin, hidden, cout, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack(p, x, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_relu_only_on_hidden_layers():
    # output layer is linear: negative values must survive
    p = _init_conv_stack(jax.random.PRNGKey(2), 6, [16], 4, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 24, 6))
    got = np.asarray(fused_conv_stack(p, x, interpret=True))
    assert (got < 0).any()


def test_cgnn_apply_fused_matches_default():
    """Full CGNN forward with fused_convs=True (interpret via CPU
    pallas) equals the XLA path."""
    import dataclasses
    from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                       cgnn_apply)

    cfg = CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=2,
                     d_s=24, num_units_init=(32,), num_units_agg=((16,),) * 2,
                     num_units_state=((32,),) * 2, num_units_readout=(16,))
    params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(1), (b, sym, sc, 8))
    pe = jax.random.normal(jax.random.PRNGKey(2), (t, sym, sc, 2))
    h = jax.random.normal(jax.random.PRNGKey(3), (b, t, sym, sc, 8))
    act = jnp.ones((b, t))
    mm = jnp.ones((b, t, 1))
    want, _ = cgnn_apply(params, cfg, y, pe, h, act, mm)
    cfg_f = dataclasses.replace(cfg, fused_convs=True)
    got, _ = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    np.testing.assert_allclose(np.asarray(got[-1][0]),
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("w,w_blk", [(3276, 512), (1584, 512), (100, 64)])
def test_blocked_matches_xla(w, w_blk):
    """W-blocked overlap-save variant == XLA at wide/odd widths."""
    from neural_rx_tpu.kernels.sepconv_pallas import fused_conv_stack_blocked
    p = _init_conv_stack(jax.random.PRNGKey(4), 12, [16, 16], 8, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 14, w, 12), jnp.float32)
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack_blocked(p, x, w_blk=w_blk,
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_dispatch_picks_blocked_for_wide_f32():
    """fused_conv_stack auto-dispatches wide/f32 grids to the blocked
    variant (whole-grid VMEM working set would exceed the budget) and
    still matches XLA."""
    p = _init_conv_stack(jax.random.PRNGKey(6), 18, [128, 128], 56,
                         "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 14, 3276, 18),
                          jnp.float32)
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack(p, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("w,valid,blocked", [
    (48, 36, False),   # whole-grid variant
    (640, 600, True),  # W-blocked variant (force via direct call)
])
def test_sc_valid_matches_direct_width(w, valid, blocked):
    """Pad-to-bucket: fused stack on a padded grid with sc_valid must
    equal the fused stack run directly at the valid width (pad columns
    re-zeroed before every layer == implicit SAME zero padding)."""
    from neural_rx_tpu.kernels.sepconv_pallas import fused_conv_stack_blocked
    p = _init_conv_stack(jax.random.PRNGKey(8), 12, [16, 16], 8, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 14, valid, 12),
                          jnp.float32)
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (0, w - valid), (0, 0)))
    if blocked:
        want = np.asarray(fused_conv_stack_blocked(p, x, w_blk=128,
                                                   interpret=True))
        got = np.asarray(fused_conv_stack_blocked(
            p, x_pad, w_blk=128, interpret=True,
            sc_valid=jnp.int32(valid)))
    else:
        want = np.asarray(fused_conv_stack(p, x, interpret=True))
        got = np.asarray(fused_conv_stack(p, x_pad, interpret=True,
                                          sc_valid=jnp.int32(valid)))
    np.testing.assert_allclose(got[:, :, :valid], want,
                               rtol=2e-5, atol=2e-5)
    # the pad region itself comes out zeroed
    assert np.all(got[:, :, valid:] == 0)


def test_cgnn_padded_fused_matches_unfused():
    """cgnn_apply with sc_valid takes the fused path too and matches the
    XLA masked path."""
    import dataclasses
    from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                       cgnn_apply)
    cfg = CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=2,
                     d_s=24, num_units_init=(32,), num_units_agg=((16,),) * 2,
                     num_units_state=((32,),) * 2, num_units_readout=(16,))
    params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
    # nonzero biases: pad-column aggregation junk must be masked
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(treedef, [
        0.5 * jax.random.normal(k, l.shape, l.dtype) if l.ndim == 1 else l
        for l, k in zip(leaves, keys)])
    b, t, sym, sc, valid = 1, 2, 14, 48, 36
    y = jax.random.normal(jax.random.PRNGKey(1), (b, sym, sc, 8))
    pe = jax.random.normal(jax.random.PRNGKey(2), (t, sym, sc, 2))
    h = jax.random.normal(jax.random.PRNGKey(3), (b, t, sym, sc, 8))
    act = jnp.ones((b, t))
    mm = jnp.ones((b, t, 1))
    sv = jnp.int32(valid)
    want, _ = cgnn_apply(params, cfg, y, pe, h, act, mm, sc_valid=sv)
    cfg_f = dataclasses.replace(cfg, fused_convs=True)
    got, _ = cgnn_apply(params, cfg_f, y, pe, h, act, mm, sc_valid=sv)
    np.testing.assert_allclose(np.asarray(got[-1][0]),
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
    # and both must equal the direct-width execution over the valid
    # region (the bucket-padding ground truth)
    direct, _ = cgnn_apply(params, cfg, y[:, :, :valid], pe[:, :, :valid],
                           h[:, :, :, :valid], act, mm)
    np.testing.assert_allclose(np.asarray(want[-1][0][:, :, :, :valid]),
                               np.asarray(direct[-1][0]),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("n_grid", [4, 8])
def test_sharded_fused_matches_unsharded(n_grid):
    """Fused stack under shard_map grid sharding (explicit halo
    exchange over the ring) == unsharded fused stack, including the
    band-edge shards."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from neural_rx_tpu.dist.fused_sharded import fused_conv_stack_sharded

    devs = np.asarray(jax.devices()[:n_grid]).reshape(1, n_grid)
    mesh = Mesh(devs, ("data", "grid"))
    p = _init_conv_stack(jax.random.PRNGKey(10), 12, [16, 16], 8,
                         "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 14, 96, 12),
                          jnp.float32)
    want = np.asarray(fused_conv_stack(p, x, interpret=True))

    fn = shard_map(
        partial(fused_conv_stack_sharded, num_shards=n_grid,
                interpret=True),
        mesh=mesh, in_specs=(P(), P(None, None, "grid", None)),
        out_specs=P(None, None, "grid", None), check_rep=False)
    got = np.asarray(jax.jit(fn)(p, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mxu_path_matches_xla_stack():
    """mxu=True (all MACs on the MXU, folded tap weights) == XLA oracle."""
    key = jax.random.PRNGKey(0)
    p = _init_conv_stack(key, 114, [128, 128], 56, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 14, 48, 114),
                          jnp.float32)
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack(p, x, interpret=True, mxu=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mxu_path_matches_blocked():
    from neural_rx_tpu.kernels.sepconv_pallas import fused_conv_stack_blocked
    key = jax.random.PRNGKey(3)
    p = _init_conv_stack(key, 24, [32], 16, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 14, 96, 24),
                          jnp.float32)
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack_blocked(p, x, w_blk=32,
                                              interpret=True, mxu=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_lp_stencil_close_to_f32_on_bf16():
    """lp_stencil accumulates the 9 taps in bf16: must stay within bf16
    rounding noise of the f32-accumulated path (and be exactly equal
    in f32, where it is a no-op)."""
    key = jax.random.PRNGKey(5)
    p = _init_conv_stack(key, 18, [64], 56, "sepconv")
    xf = jax.random.normal(jax.random.PRNGKey(6), (1, 14, 48, 18),
                           jnp.float32)
    f32_same = np.asarray(fused_conv_stack(p, xf, interpret=True,
                                           lp_stencil=True))
    np.testing.assert_array_equal(
        f32_same, np.asarray(fused_conv_stack(p, xf, interpret=True)))
    xb = xf.astype(jnp.bfloat16)
    base = np.asarray(fused_conv_stack(p, xb, interpret=True)
                      .astype(jnp.float32))
    lp = np.asarray(fused_conv_stack(p, xb, interpret=True,
                                     lp_stencil=True).astype(jnp.float32))
    scale = np.abs(base).max()
    assert np.abs(lp - base).max() < 0.08 * scale


def test_blocked_single_block_grid():
    """w <= w_blk: the clamped neighbor fetches point at the block
    itself; halo columns must still be masked to exact SAME-conv
    semantics."""
    from neural_rx_tpu.kernels.sepconv_pallas import fused_conv_stack_blocked
    p = _init_conv_stack(jax.random.PRNGKey(7), 12, [16], 8, "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 14, 40, 12))
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(fused_conv_stack_blocked(p, x, w_blk=64,
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
