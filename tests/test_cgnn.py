"""CGNN architecture tests: exact reference parameter count, forward
shapes, aggregation semantics, depth truncation, var-MCS modes.
Reference: utils/neural_rx.py:61-595; param count verified against
weights/nrx_rt_weights (142,922)."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params, cgnn_apply,
                                   count_params, pilot_positional_encoding,
                                   _aggregate_user_states, _init_mlp)


def nrx_rt_cfg(**over):
    kw = dict(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=2, d_s=56,
              num_units_init=(128, 128), num_units_agg=((64,), (64,)),
              num_units_state=((128, 128), (128, 128)),
              num_units_readout=(128,), layer_type_conv="sepconv",
              var_mcs_masking=False, initial_chest=True)
    kw.update(over)
    return CGNNConfig(**kw)


class TestParamCount:
    def test_nrx_rt_142922(self):
        cfg = nrx_rt_cfg()
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        assert count_params(params) == 142922

    def test_extra_iteration_49k(self):
        c2 = init_cgnn_params(jax.random.PRNGKey(0), nrx_rt_cfg())
        c3 = init_cgnn_params(jax.random.PRNGKey(0), nrx_rt_cfg(
            num_it=3, num_units_agg=((64,),) * 3,
            num_units_state=((128, 128),) * 3))
        assert count_params(c3) - count_params(c2) == 49074


class TestForward:
    def setup_method(self):
        self.cfg = nrx_rt_cfg()
        self.params = init_cgnn_params(jax.random.PRNGKey(0), self.cfg)
        b, t, sym, sc = 2, 2, 14, 48
        k = jax.random.PRNGKey(1)
        self.y = jax.random.normal(k, (b, sym, sc, 8))
        self.pe = jax.random.normal(k, (t, sym, sc, 2))
        self.h = jax.random.normal(k, (b, t, sym, sc, 8))
        self.active = jnp.ones((b, t))
        self.mcs_mask = jnp.ones((b, t, 1))

    def test_shapes(self):
        llrs, h_hats = cgnn_apply(self.params, self.cfg, self.y, self.pe,
                                  self.h, self.active, self.mcs_mask)
        assert len(llrs) == 1  # only final readout at eval
        assert llrs[0][0].shape == (2, 2, 14, 48, 4)
        assert h_hats[0].shape == (2, 2, 14, 48, 8)

    def test_multiloss_returns_all_iterations(self):
        llrs, h_hats = cgnn_apply(self.params, self.cfg, self.y, self.pe,
                                  self.h, self.active, self.mcs_mask,
                                  training=True, apply_multiloss=True)
        assert len(llrs) == 2 and len(h_hats) == 2

    def test_depth_truncation(self):
        llrs1, _ = cgnn_apply(self.params, self.cfg, self.y, self.pe,
                              self.h, self.active, self.mcs_mask, num_it=1)
        llrs2, _ = cgnn_apply(self.params, self.cfg, self.y, self.pe,
                              self.h, self.active, self.mcs_mask, num_it=2)
        assert not np.allclose(np.asarray(llrs1[0][0]),
                               np.asarray(llrs2[0][0]))

    def test_input_norm_scale_invariance(self):
        # scaling y and h_hat jointly must not change the output
        l1, _ = cgnn_apply(self.params, self.cfg, self.y, self.pe, self.h,
                           self.active, self.mcs_mask)
        l2, _ = cgnn_apply(self.params, self.cfg, 10 * self.y, self.pe,
                           10 * self.h, self.active, self.mcs_mask)
        assert np.allclose(np.asarray(l1[0][0]), np.asarray(l2[0][0]),
                           atol=1e-3)

    def test_bf16_compute(self):
        llrs, _ = cgnn_apply(self.params, self.cfg, self.y, self.pe,
                             self.h, self.active, self.mcs_mask,
                             dtype=jnp.bfloat16)
        out = np.asarray(llrs[0][0])
        assert out.dtype == np.float32  # readouts cast back
        assert np.isfinite(out).all()


class TestAggregation:
    def test_single_user_zero_aggregate(self):
        # with one active user the aggregate must be exactly zero-scaled
        p = _init_mlp(jax.random.PRNGKey(0), 8, (16,), 8)
        s = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 4, 8))
        active = jnp.asarray([[1., 0.]] * 3)
        a = _aggregate_user_states(p, s, active, jnp.float32)
        # for the active user: sum(active others) - self = -0 ... the
        # aggregate for user 0 = (sp0 - sp0) = 0 after masking user 1
        assert np.allclose(np.asarray(a[:, 0]), 0.0, atol=1e-6)

    def test_two_users_swap_symmetry(self):
        p = _init_mlp(jax.random.PRNGKey(0), 8, (16,), 8)
        s = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 8))
        active = jnp.ones((1, 2))
        a = _aggregate_user_states(p, s, active, jnp.float32)
        s_sw = s[:, ::-1]
        a_sw = _aggregate_user_states(p, s_sw, active, jnp.float32)
        assert np.allclose(np.asarray(a[:, 0]), np.asarray(a_sw[:, 1]),
                           atol=1e-6)


class TestVarMCS:
    def test_masking_mode_param_sharing(self):
        cfg_mask = nrx_rt_cfg(num_bits_per_symbol=(2, 4, 6),
                              var_mcs_masking=True)
        cfg_sep = nrx_rt_cfg(num_bits_per_symbol=(2, 4, 6),
                             var_mcs_masking=False)
        p_mask = init_cgnn_params(jax.random.PRNGKey(0), cfg_mask)
        p_sep = init_cgnn_params(jax.random.PRNGKey(0), cfg_sep)
        assert len(p_mask["s_init"]) == 1 and len(p_sep["s_init"]) == 3
        assert count_params(p_mask) < count_params(p_sep)

    def test_masking_mode_llr_truncation(self):
        cfg = nrx_rt_cfg(num_bits_per_symbol=(2, 4), var_mcs_masking=True)
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        y = jnp.ones((1, 14, 48, 8))
        pe = jnp.ones((1, 14, 48, 2))
        h = jnp.ones((1, 1, 14, 48, 8))
        llrs, _ = cgnn_apply(params, cfg, y, pe, h, jnp.ones((1, 1)),
                             jnp.ones((1, 1, 2)))
        assert llrs[0][0].shape[-1] == 2
        assert llrs[0][1].shape[-1] == 4
        # QPSK head = first 2 dims of the 16QAM head (shared output layer)
        assert np.allclose(np.asarray(llrs[0][0]),
                           np.asarray(llrs[0][1][..., :2]))


class TestPositionalEncoding:
    def test_zscore_and_structure(self):
        g = np.zeros((1, 14, 48), np.complex64)
        g[0, 2, ::2] = 1.0
        g[0, 11, ::2] = 1.0
        mask = np.abs(g[0]) > 0
        pe = pilot_positional_encoding(g, mask)
        assert pe.shape == (1, 14, 48, 2)
        # z-scored per axis: zero mean over symbols (time channel)
        assert np.allclose(pe[0, :, 0, 0].mean(), 0.0, atol=1e-6)
        assert np.allclose(pe[0, :, 0, 0].std(), 1.0, atol=1e-5)
        # freq: zero mean over subcarriers
        assert np.allclose(pe[0, 0, :, 1].mean(), 0.0, atol=1e-6)
        # freq distance pattern alternates (pilot combs on even SCs)
        assert pe[0, 0, 0, 1] < pe[0, 0, 1, 1]
