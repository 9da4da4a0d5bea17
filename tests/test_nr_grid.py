"""Tests for DMRS generation, PUSCH config/TBS, resource grid, transmitter,
and LS channel estimation — against closed-form 38.211/38.214 expectations
(reference parity targets cited per test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.phy.nr.dmrs import (DMRSConfig, dmrs_symbol_indices,
                                       dmrs_grid_for_port, pilot_mask)
from neural_rx_tpu.phy.nr.pusch import CarrierConfig, PUSCHConfig
from neural_rx_tpu.phy.nr.transmitter import PUSCHTransmitter
from neural_rx_tpu.phy.grid import ResourceGrid
from neural_rx_tpu.phy.chest import LSChannelEstimator
from neural_rx_tpu.phy.misc import binary_source


def make_configs(n_prb=4, mcs=14, num_tx=2, **dmrs_overrides):
    """The nrx_rt system configuration (reference config/nrx_rt.cfg)."""
    carrier = CarrierConfig(n_size_grid=n_prb)
    port_sets = [(0,), (2,)][:num_tx]
    cfgs = []
    for i, ports in enumerate(port_sets):
        dmrs = DMRSConfig(config_type=1, type_a_position=2,
                          additional_position=1, length=1,
                          dmrs_port_set=ports, n_scid=1,
                          num_cdm_groups_without_data=2, n_id=(1, 1),
                          **dmrs_overrides)
        cfgs.append(PUSCHConfig(carrier, dmrs, mcs_index=mcs,
                                num_antenna_ports=2, precoding="codebook",
                                tpmi=2, n_rnti=1, n_id=1))
    return cfgs


class TestDMRS:
    def test_symbol_indices_type_a_pos2_add1(self):
        # nrx_rt: mapping A, l0=2, additional=1, 14 symbols -> l = {2, 11}
        assert dmrs_symbol_indices("A", 2, 1, 1, (0, 14)) == [2, 11]

    def test_symbol_indices_additional_positions(self):
        assert dmrs_symbol_indices("A", 2, 0, 1, (0, 14)) == [2]
        assert dmrs_symbol_indices("A", 2, 2, 1, (0, 14)) == [2, 7, 11]
        assert dmrs_symbol_indices("A", 2, 3, 1, (0, 14)) == [2, 5, 8, 11]

    def test_grid_comb_structure(self):
        cfg = DMRSConfig(dmrs_port_set=(0,), n_scid=1,
                         num_cdm_groups_without_data=2, n_id=(1, 1))
        g = dmrs_grid_for_port(cfg, 0, 48, (0, 14), 0)
        # port 0 -> CDM group 0 -> even subcarriers only, symbols 2 & 11
        nonzero_syms = sorted(set(np.where(np.abs(g) > 0)[0]))
        assert nonzero_syms == [2, 11]
        nonzero_sc = np.where(np.abs(g[2]) > 0)[0]
        assert np.array_equal(nonzero_sc, np.arange(0, 48, 2))
        # amplitude = beta / sqrt(2) per component * |QPSK| = beta = sqrt(2)
        assert np.allclose(np.abs(g[2, nonzero_sc]), np.sqrt(2), atol=1e-6)

    def test_port2_on_other_comb(self):
        cfg = DMRSConfig(dmrs_port_set=(2,), n_scid=1, n_id=(1, 1))
        g = dmrs_grid_for_port(cfg, 2, 48, (0, 14), 0)
        nonzero_sc = np.where(np.abs(g[2]) > 0)[0]
        assert np.array_equal(nonzero_sc, np.arange(1, 48, 2))

    def test_pilot_mask_covers_both_combs(self):
        cfg = DMRSConfig(num_cdm_groups_without_data=2)
        m = pilot_mask(cfg, 48, (0, 14))
        assert m[2].all() and m[11].all()
        assert m.sum() == 2 * 48

    def test_sequences_differ_across_slots_and_symbols(self):
        cfg = DMRSConfig(dmrs_port_set=(0,), n_scid=1, n_id=(1, 1))
        g0 = dmrs_grid_for_port(cfg, 0, 48, (0, 14), 0)
        g1 = dmrs_grid_for_port(cfg, 0, 48, (0, 14), 1)
        assert not np.allclose(g0[2], g1[2])
        assert not np.allclose(g0[2], g0[11])

    def test_double_symbol_pairs(self):
        import pytest
        # type A double-symbol (Table 6.4.1.1.3-4): l = {2,3} (+ {10,11})
        assert dmrs_symbol_indices("A", 2, 0, 2, (0, 14)) == [2, 3]
        assert dmrs_symbol_indices("A", 2, 1, 2, (0, 14)) == [2, 3, 10, 11]
        # type B double-symbol: the pair starts at the allocation start;
        # additional positions are refused (unverified table column)
        assert dmrs_symbol_indices("B", 2, 0, 2, (1, 12)) == [1, 2]
        with pytest.raises(ValueError, match="unverified"):
            dmrs_symbol_indices("B", 2, 1, 2, (0, 12))
        # every pair is consecutive and inside the allocation
        syms = dmrs_symbol_indices("A", 2, 1, 2, (0, 14))
        assert len(syms) % 2 == 0
        for a, b in zip(syms[::2], syms[1::2]):
            assert b == a + 1
            assert 0 <= a and b < 14

    def test_double_symbol_time_occ(self):
        # ports 4-7 (type 1) carry w_t=(+1,-1): second symbol of each
        # pair is sign-flipped relative to a +1 time-OCC port on the
        # same comb (up to the per-symbol scrambling sequence)
        cfg = DMRSConfig(dmrs_port_set=(0, 4), n_scid=1, n_id=(1, 1),
                         length=2)
        g0 = dmrs_grid_for_port(cfg, 0, 48, (0, 14), 0)
        g4 = dmrs_grid_for_port(cfg, 4, 48, (0, 14), 0)
        syms = dmrs_symbol_indices("A", 2, 1, 2, (0, 14))
        first, second = syms[0], syms[1]
        np.testing.assert_allclose(g4[first], g0[first])
        np.testing.assert_allclose(g4[second], -g0[second])


class TestPUSCHConfig:
    def test_tbs_nrx_rt(self):
        # 4 PRB, MCS 14 (16QAM, R=553/1024): N_RE = min(156,144)*4 = 576,
        # Ninfo = 576*4*553/1024 = 1244.25 -> Ninfo' = 16*77 = 1232
        # -> TBS = 1256 (38.214 Table 5.1.3.2-1)
        cfg = make_configs()[0]
        assert cfg.num_data_res == 12 * 48
        assert cfg.num_coded_bits == 12 * 48 * 4
        assert cfg.tb_size == 1256

    def test_precoding_tpmi2(self):
        # codebook phases from Table 6.3.1.5-1, renormalized to unit
        # column norm (reference-curve calibration; see
        # PUSCHConfig.precoding_matrix docstring)
        cfg = make_configs()[0]
        w = cfg.precoding_matrix()
        s = 1 / np.sqrt(2)
        assert np.allclose(w, np.array([[s], [s]]))
        assert np.isclose(np.linalg.norm(w), 1.0)

    def test_tbs_132_prb(self):
        cfg = make_configs(n_prb=132)[0]
        # scales with PRBs; sanity: effective coderate ~ target 553/1024
        r = cfg.tb_size / cfg.num_coded_bits
        assert abs(r - 553 / 1024) < 0.01


class TestResourceGrid:
    def test_data_mask_excludes_dmrs_symbols(self):
        rg = ResourceGrid(make_configs())
        assert rg.num_data_symbols == 12 * 48
        assert not rg.data_mask[2].any() and not rg.data_mask[11].any()
        assert rg.data_mask[0].all()

    def test_map_demap_roundtrip(self):
        rg = ResourceGrid(make_configs())
        x = jnp.arange(rg.num_data_symbols, dtype=jnp.complex64)
        grid = rg.map_data(x)
        assert grid.shape == (14, 48)
        back = rg.demap_data(grid)
        assert jnp.allclose(back, x)

    def test_pilot_bank_num_slots(self):
        rg = ResourceGrid(make_configs())
        assert rg.dmrs_grids.shape == (20, 2, 14, 48)  # 30 kHz -> 20 slots


class TestTransmitter:
    def test_output_shape_and_power(self):
        tx = PUSCHTransmitter(make_configs())
        key = jax.random.PRNGKey(0)
        bits = binary_source(key, (4, 2, tx.tb_size))
        x = tx(bits)
        assert x.shape == (4, 2, 2, 14, 48)
        # unit-norm precoding -> mean per-RE total tx power = 1
        data_syms = [0, 1, 3, 4, 5, 6, 7, 8, 9, 10, 12, 13]  # non-DMRS
        data_re = np.asarray(x)[:, :, :, data_syms, :]
        pow_per_ue = (np.abs(data_re) ** 2).sum(axis=2)  # sum over ports
        assert np.allclose(pow_per_ue.mean(), 1.0, atol=0.04)

    def test_dmrs_embedded(self):
        cfgs = make_configs()
        tx = PUSCHTransmitter(cfgs)
        bits = jnp.zeros((1, 2, tx.tb_size))
        x = np.asarray(tx(bits))
        g0 = cfgs[0].dmrs_grid(0)
        # UE0 port0 symbol 2 = w[0]*dmrs = dmrs/sqrt(2) on even SCs
        assert np.allclose(x[0, 0, 0, 2, ::2], g0[2, ::2] / np.sqrt(2),
                           atol=1e-5)


class TestLSEstimator:
    def test_perfect_estimate_flat_channel(self):
        cfgs = make_configs()
        rg = ResourceGrid(cfgs)
        tx = PUSCHTransmitter(cfgs)
        est = LSChannelEstimator(rg, "nn")
        key = jax.random.PRNGKey(1)
        bits = binary_source(key, (2, 2, tx.tb_size))
        x = tx(bits)  # [b, tx, ports, 14, sc]
        # flat channel: h[ant, tx, port] constants
        h = (jax.random.normal(key, (2, 4, 2, 2))
             + 1j * jax.random.normal(jax.random.PRNGKey(2), (2, 4, 2, 2))
             ).astype(jnp.complex64)
        hf = h[..., None, None] * jnp.ones((14, 48))
        y = jnp.einsum("batp,btpsc->basc", h, x)
        h_hat, err_var = est(y, 0.01)
        assert h_hat.shape == (2, 4, 2, 14, 48)
        # effective channel = h @ w, w = [1,1]/sqrt(2)
        h_eff = (hf[:, :, :, 0] + hf[:, :, :, 1]) / np.sqrt(2)
        assert np.allclose(np.asarray(h_hat), np.asarray(h_eff), atol=1e-4)

    def test_estimate_planar_matches_complex_path(self):
        """The TPU planar fast path must be numerically identical to the
        complex __call__ + re/im channel stacking it replaces."""
        rg = ResourceGrid(make_configs())
        est = LSChannelEstimator(rg, "nn")
        key = jax.random.PRNGKey(3)
        y = (jax.random.normal(key, (2, 4, 14, 48))
             + 1j * jax.random.normal(jax.random.PRNGKey(4), (2, 4, 14, 48))
             ).astype(jnp.complex64)
        y_pl = jnp.stack([y.real, y.imag], axis=-1)
        for slot_idx in (None, jnp.asarray(5), jnp.asarray(11)):
            h_hat, _ = est(y, 0.01, slot_idx=slot_idx)
            want = jnp.concatenate(
                [jnp.moveaxis(h_hat.real, 1, -1),
                 jnp.moveaxis(h_hat.imag, 1, -1)], axis=-1)
            got = est.estimate_planar(y_pl, slot_idx=slot_idx)
            assert got.shape == want.shape
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5), f"slot_idx={slot_idx}"

    def test_estimate_planar_dense_bit_exact(self):
        """The gather-free comb-factorized NN path (round-4 serving
        prep optimization) must be BIT-exact vs estimate_planar, in f32
        and with early bf16 rounding, for any slot index."""
        rg = ResourceGrid(make_configs())
        est = LSChannelEstimator(rg, "nn")
        assert est._dense_ok, "type-1 comb pattern must factorize"
        y_pl = jax.random.normal(jax.random.PRNGKey(7),
                                 (2, 4, 14, 48, 2), jnp.float32)
        for slot_idx in (None, jnp.asarray(5)):
            for od in (None, jnp.bfloat16):
                a = est.estimate_planar(y_pl, slot_idx=slot_idx,
                                        out_dtype=od)
                b = est.estimate_planar_dense(y_pl, slot_idx=slot_idx,
                                              out_dtype=od)
                assert a.dtype == b.dtype and a.shape == b.shape
                assert bool(jnp.all(a == b)), (slot_idx, od)

    def test_err_var_scaling(self):
        rg = ResourceGrid(make_configs())
        est = LSChannelEstimator(rg, "nn")
        y = jnp.ones((1, 4, 14, 48), jnp.complex64)
        _, ev1 = est(y, 0.1)
        _, ev2 = est(y, 0.2)
        assert np.allclose(np.asarray(ev2), 2 * np.asarray(ev1))
        # |pilot|^2 = 2 (beta^2) -> no/2, halved again by FOCC
        # pair despreading -> err_var = no/4
        assert np.allclose(np.asarray(ev1), 0.025)
