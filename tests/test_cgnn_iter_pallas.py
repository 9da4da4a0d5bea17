"""Fused whole-iteration pallas kernel vs the XLA aggregation + update
path (kernels/cgnn_iter_pallas.py). CPU interpret mode; Mosaic lowering
is covered by scripts/tpu_compile_smoke.py on hardware."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                   cgnn_apply, _aggregate_user_states,
                                   _update_state)
from neural_rx_tpu.kernels.cgnn_iter_pallas import fused_iteration


def _randomize_biases(params, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        0.5 * jax.random.normal(k, l.shape, l.dtype) if l.ndim == 1 else l
        for l, k in zip(leaves, keys)])


def _setup(d_s=24, t=2, sc=48, num_it=2):
    cfg = CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4,
                     num_it=num_it, d_s=d_s, num_units_init=(32,),
                     num_units_agg=((16,),) * num_it,
                     num_units_state=((32,),) * num_it,
                     num_units_readout=(16,))
    params = _randomize_biases(
        init_cgnn_params(jax.random.PRNGKey(0), cfg),
        jax.random.PRNGKey(5))
    b, sym = 2, 14
    s = jax.random.normal(jax.random.PRNGKey(1), (b, t, sym, sc, d_s))
    pe = jax.random.normal(jax.random.PRNGKey(2), (t, sym, sc, 2))
    return cfg, params, s, pe


@pytest.mark.parametrize("active", [(1, 1), (1, 0)])
@pytest.mark.parametrize("w_blk", [16, 32, 4096])
def test_fused_iteration_matches_xla(active, w_blk):
    # w_blk=4096 >= W exercises the whole-grid halo-free variant
    cfg, params, s, pe = _setup()
    b = s.shape[0]
    act = jnp.broadcast_to(jnp.asarray(active, jnp.float32), (b, 2))
    it_p = params["iterations"][0]

    a = _aggregate_user_states(it_p["agg"], s, act, s.dtype)
    want = _update_state(it_p["update"], s, a, pe, "sepconv")
    got = fused_iteration(it_p, s, pe, act, w_blk=w_blk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_iteration_sc_valid_matches_direct():
    """Bucket-padded fused iteration == direct-width XLA iteration over
    the valid columns (nonzero biases: the pad-column aggregation junk
    must be masked inside the kernel)."""
    cfg, params, s, pe = _setup(sc=48)
    valid = 36
    b = s.shape[0]
    act = jnp.ones((b, 2))
    it_p = params["iterations"][0]

    sd = s.at[:, :, :, valid:].set(0.0)
    ped = pe.at[:, :, valid:].set(0.0)
    a = _aggregate_user_states(it_p["agg"], s[:, :, :, :valid], act,
                               s.dtype)
    want = _update_state(it_p["update"], s[:, :, :, :valid], a,
                         pe[:, :, :valid], "sepconv")
    got = fused_iteration(it_p, sd, ped, act,
                          sc_valid=jnp.int32(valid), w_blk=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :, :, :valid]),
                               np.asarray(want), rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got[:, :, :, valid:]) == 0)


def test_cgnn_apply_fused_iteration_end_to_end():
    """cgnn_apply(fused_iteration=True) == default path, LLR-level."""
    cfg, params, s, pe = _setup()
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(3), (b, sym, sc, 8))
    h = jax.random.normal(jax.random.PRNGKey(4), (b, t, sym, sc, 8))
    act = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    mm = jnp.ones((b, t, 1))
    want, wh = cgnn_apply(params, cfg, y, pe, h, act, mm)
    cfg_f = dataclasses.replace(cfg, fused_iteration=True)
    got, gh = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    np.testing.assert_allclose(np.asarray(got[-1][0]),
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gh[-1]), np.asarray(wh[-1]),
                               rtol=5e-5, atol=5e-5)


def test_fused_iteration_mxu_rejected():
    """conv_mxu measured slower and the T-stacked kernel dropped it:
    the fused iteration must refuse it loudly (XLA path still honors
    conv_mxu via fused_conv_stack)."""
    cfg, params, s, pe = _setup()
    b = s.shape[0]
    act = jnp.broadcast_to(jnp.asarray((1, 1), jnp.float32), (b, 2))
    it_p = params["iterations"][0]
    with pytest.raises(ValueError):
        fused_iteration(it_p, s, pe, act, w_blk=32, interpret=True,
                        mxu=True)



def test_cgnn_apply_fused_readout_matches_default():
    """fused_readout=True: final-iteration in-VMEM LLR AND chest
    readouts == default path (single-MCS serving mode; the kernel
    returns (llr, h_hat) like the reference engine)."""
    cfg, params, s, pe = _setup()
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(3), (b, sym, sc, 8))
    h = jax.random.normal(jax.random.PRNGKey(4), (b, t, sym, sc, 8))
    act = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    mm = jnp.ones((b, t, 1))
    want, wh = cgnn_apply(params, cfg, y, pe, h, act, mm)
    cfg_f = dataclasses.replace(cfg, fused_iteration=True,
                                fused_readout=True)
    got, gh = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    np.testing.assert_allclose(np.asarray(got[-1][0]),
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gh[-1]), np.asarray(wh[-1]),
                               rtol=5e-5, atol=5e-5)


def test_cgnn_apply_fused_full_matches_default():
    """fused_full=True (whole-receiver mega-kernel: init + iterations +
    readouts in ONE pallas_call) == default path at LLR AND chest
    level, including an inactive user."""
    cfg, params, s, pe = _setup()
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(3), (b, sym, sc, 8))
    h = jax.random.normal(jax.random.PRNGKey(4), (b, t, sym, sc, 8))
    act = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    mm = jnp.ones((b, t, 1))
    want, wh = cgnn_apply(params, cfg, y, pe, h, act, mm)
    cfg_f = dataclasses.replace(cfg, fused_full=True)
    got, gh = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    assert len(got) == 1 and len(gh) == 1
    np.testing.assert_allclose(np.asarray(got[-1][0]),
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gh[-1]), np.asarray(wh[-1]),
                               rtol=5e-5, atol=5e-5)


def test_cgnn_apply_fused_full_bucket_padded():
    """Mega-kernel under pad-to-bucket dispatch: valid-column outputs
    match the direct-width mega-kernel run."""
    cfg, params, s, pe = _setup(sc=48)
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(3), (b, sym, sc, 8))
    h = jax.random.normal(jax.random.PRNGKey(4), (b, t, sym, sc, 8))
    act = jnp.ones((b, t))
    mm = jnp.ones((b, t, 1))
    cfg_f = dataclasses.replace(cfg, fused_full=True)
    want, wh = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    pad = 16
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, pad), (0, 0)))
    hp = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    pep = jnp.pad(pe, ((0, 0), (0, 0), (0, pad), (0, 0)))
    got, gh = cgnn_apply(params, cfg_f, yp, pep, hp, act, mm,
                         sc_valid=jnp.int32(sc))
    np.testing.assert_allclose(np.asarray(got[-1][0])[:, :, :, :sc],
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gh[-1])[:, :, :, :sc],
                               np.asarray(wh[-1]),
                               rtol=5e-5, atol=5e-5)


def test_cgnn_apply_fused_readout_bucket_padded():
    """fused_readout under pad-to-bucket dispatch: LLRs on the valid
    columns match the direct-width run."""
    cfg, params, s, pe = _setup(sc=48)
    b, t, sym, sc = 2, 2, 14, 48
    y = jax.random.normal(jax.random.PRNGKey(3), (b, sym, sc, 8))
    h = jax.random.normal(jax.random.PRNGKey(4), (b, t, sym, sc, 8))
    act = jnp.ones((b, t))
    mm = jnp.ones((b, t, 1))
    cfg_f = dataclasses.replace(cfg, fused_iteration=True,
                                fused_readout=True)
    want, _ = cgnn_apply(params, cfg_f, y, pe, h, act, mm)
    pad = 16
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, pad), (0, 0)))
    hp = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    pep = jnp.pad(pe, ((0, 0), (0, 0), (0, pad), (0, 0)))
    got, _ = cgnn_apply(params, cfg_f, yp, pep, hp, act, mm,
                        sc_valid=jnp.int32(sc))
    np.testing.assert_allclose(np.asarray(got[-1][0])[:, :, :, :sc],
                               np.asarray(want[-1][0]),
                               rtol=5e-5, atol=5e-5)
