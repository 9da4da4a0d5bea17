"""Oracle tests for L1 PHY primitives (constellation, mapping, OFDM, CRC)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.phy.constellation import qam_points, Constellation
from neural_rx_tpu.phy.mapping import map_bits, demap_maxlog, demap_app
from neural_rx_tpu.phy.ofdm import ofdm_modulate, ofdm_demodulate
from neural_rx_tpu.phy.misc import ebnodb2no, complex_awgn, binary_source
from neural_rx_tpu.phy.nr.crc import (crc_attach, crc_check,
                                      crc_generator_matrix,
                                      _crc_remainder_bits, CRC_POLYS)
from neural_rx_tpu.phy.nr.sequences import gold_sequence


class TestConstellation:
    def test_unit_energy(self):
        for m in (2, 4, 6, 8):
            pts = qam_points(m)
            assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-6

    def test_qpsk_points(self):
        pts = qam_points(2)
        # bit pattern 00 -> (+1+j)/sqrt(2) per 38.211 5.1.3
        assert np.allclose(pts[0], (1 + 1j) / np.sqrt(2), atol=1e-6)
        assert np.allclose(pts[3], (-1 - 1j) / np.sqrt(2), atol=1e-6)

    def test_gray_property(self):
        # adjacent PAM levels differ in one bit
        for m in (2, 4, 6):
            pts = qam_points(m, normalize=False)
            n = 2**m
            for i in range(n):
                for j in range(i + 1, n):
                    d = abs(pts[i] - pts[j])
                    if abs(d - 2.0) < 1e-9:  # nearest neighbors
                        assert bin(i ^ j).count("1") == 1

    def test_trainable_constraints(self):
        c = Constellation(4, trainable=True)
        p = c.init_params() + 0.3  # perturb
        pts = Constellation.points(p, center=True)
        assert abs(jnp.mean(jnp.abs(pts) ** 2) - 1.0) < 1e-5
        assert abs(jnp.mean(pts)) < 1e-6


class TestMapping:
    def test_map_roundtrip_demap(self):
        key = jax.random.PRNGKey(0)
        for m in (2, 4, 6):
            pts = jnp.asarray(qam_points(m))
            bits = binary_source(key, (128, m * 10))
            sym = map_bits(bits, pts)
            llr = demap_maxlog(sym, pts, jnp.asarray(0.01))
            hard = (llr > 0).astype(jnp.float32).reshape(128, -1)
            np.testing.assert_array_equal(np.asarray(hard), np.asarray(bits))

    def test_app_vs_maxlog_high_snr(self):
        pts = jnp.asarray(qam_points(4))
        key = jax.random.PRNGKey(1)
        bits = binary_source(key, (64, 4 * 8))
        sym = map_bits(bits, pts)
        y = sym + complex_awgn(jax.random.PRNGKey(2), sym.shape, 1e-4)
        llr_a = demap_app(y, pts, jnp.asarray(1e-4))
        llr_m = demap_maxlog(y, pts, jnp.asarray(1e-4))
        assert np.array_equal(np.sign(llr_a), np.sign(llr_m))

    def test_awgn_llr_scaling_qpsk(self):
        # QPSK maxlog LLR = 2*sqrt(2)*y/no per component... check sign &
        # magnitude against closed form 4*y_re/(sqrt(2)*no)
        pts = jnp.asarray(qam_points(2))
        y = jnp.asarray([0.3 + 0.1j])
        no = jnp.asarray(0.5)
        llr = demap_maxlog(y, pts, no)
        # bit0 from real axis: (|y+s|^2 diffs)/no = 4*re(y)*s/no
        expect0 = -4 * 0.3 * (1 / np.sqrt(2)) / 0.5
        expect1 = -4 * 0.1 * (1 / np.sqrt(2)) / 0.5
        np.testing.assert_allclose(np.asarray(llr[0]),
                                   [expect0, expect1], rtol=1e-5)


class TestOFDM:
    def test_mod_demod_identity(self):
        key = jax.random.PRNGKey(3)
        x = (jax.random.normal(key, (2, 14, 48))
             + 1j * jax.random.normal(jax.random.PRNGKey(4), (2, 14, 48)))
        t = ofdm_modulate(x, cp_length=4)
        assert t.shape == (2, 14 * 52)
        x2 = ofdm_demodulate(t, 48, 4)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)

    def test_energy_preserved(self):
        x = jnp.ones((1, 14, 48), jnp.complex64)
        t = ofdm_modulate(x, 0)
        np.testing.assert_allclose(float(jnp.sum(jnp.abs(t) ** 2)),
                                   float(jnp.sum(jnp.abs(x) ** 2)), rtol=1e-5)


class TestCRC:
    @pytest.mark.parametrize("crc_type", ["CRC24A", "CRC24B", "CRC16"])
    def test_matrix_matches_bitserial(self, crc_type):
        length, poly = CRC_POLYS[crc_type]
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, 100).astype(np.int8)
        oracle = _crc_remainder_bits(bits, length, poly)
        g = crc_generator_matrix(100, crc_type)
        fast = np.mod(bits.astype(np.float32) @ g, 2)
        np.testing.assert_array_equal(oracle, fast.astype(np.int8))

    def test_attach_check_roundtrip(self):
        key = jax.random.PRNGKey(0)
        bits = binary_source(key, (8, 120))
        with_crc = crc_attach(bits, "CRC24A")
        assert with_crc.shape == (8, 144)
        assert bool(jnp.all(crc_check(with_crc, "CRC24A")))
        corrupted = with_crc.at[:, 5].set(1 - with_crc[:, 5])
        assert not bool(jnp.any(crc_check(corrupted, "CRC24A")))


class TestSequences:
    def test_gold_known_value(self):
        # x1-only prefix property: c_init=0 -> c = x1 shifted (x2 = 0)
        c = gold_sequence(0, 16)
        c2 = gold_sequence(0, 16)
        np.testing.assert_array_equal(c, c2)
        # balancedness (statistical sanity)
        c = gold_sequence(12345, 10000)
        assert abs(np.mean(c) - 0.5) < 0.02


class TestMisc:
    def test_ebnodb2no(self):
        no = ebnodb2no(0.0, 2, 0.5, 14 * 48, 12 * 48)
        np.testing.assert_allclose(float(no), (14 / 12), rtol=1e-6)

    def test_awgn_variance(self):
        n = complex_awgn(jax.random.PRNGKey(0), (100000,), 0.25)
        assert abs(float(jnp.mean(jnp.abs(n) ** 2)) - 0.25) < 0.01


class TestSourcesAndPatterns:
    def test_qam_source_statistics(self):
        from neural_rx_tpu.phy.sources import qam_source
        import jax
        x = np.asarray(qam_source(jax.random.PRNGKey(0), (20000,), 4))
        assert abs((np.abs(x) ** 2).mean() - 1.0) < 0.05
        assert len(np.unique(np.round(x, 5))) == 16

    def test_qam_source_with_bits_consistent(self):
        from neural_rx_tpu.phy.sources import qam_source_with_bits
        from neural_rx_tpu.phy.mapping import demap_maxlog
        from neural_rx_tpu.phy.constellation import qam_points
        import jax, jax.numpy as jnp
        sym, bits = qam_source_with_bits(jax.random.PRNGKey(1), (64,), 4)
        llr = demap_maxlog(sym, jnp.asarray(qam_points(4)),
                           jnp.asarray(0.01))
        np.testing.assert_array_equal(np.asarray(llr) > 0,
                                      np.asarray(bits) > 0.5)

    def test_kronecker_pattern_orthogonal(self):
        from neural_rx_tpu.phy.pilot_pattern import \
            kronecker_pilot_pattern
        pp = kronecker_pilot_pattern(2, 14, 24, [2, 11])
        assert pp.num_pilot_symbols == 2 * 24
        # disjoint supports across TXs
        nz0 = np.abs(pp.pilots[0]) > 0
        nz1 = np.abs(pp.pilots[1]) > 0
        assert not np.any(nz0 & nz1)
        # unit average energy over the grid positions each TX occupies
        assert abs(np.mean(np.abs(pp.pilots[0][nz0]) ** 2) - 2.0) < 1e-5

    def test_empty_pattern(self):
        from neural_rx_tpu.phy.pilot_pattern import empty_pilot_pattern
        pp = empty_pilot_pattern(1, 14, 48)
        assert pp.num_pilot_symbols == 0
