"""Pallas layered min-sum LDPC decoder tests.

Strategy (interpret mode is ~25 s per decoder iteration on CPU, so the
heavy statistical checks run against a NumPy oracle of the identical
layered schedule; the pallas kernel is verified bit-exact against that
oracle, and full-speed statistical equivalence runs on TPU):
1. kernel == NumPy oracle, bit-exact (2 iterations, interpret mode)
2. oracle(10 layered min-sum iters) ~ flooding boxplus(20) near the
   waterfall (statistical, NumPy — fast)
3. TB-level fallback contract for unsupported lifting sizes
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.phy.nr.tb import TBConfig, tb_encode, tb_decode
from neural_rx_tpu.phy.nr.ldpc import encode as ldpc_encode
from neural_rx_tpu.phy.constellation import qam_points
from neural_rx_tpu.phy.mapping import map_bits, demap_maxlog
from neural_rx_tpu.phy.misc import binary_source, complex_awgn
from neural_rx_tpu.kernels.ldpc_pallas import (make_decoder,
                                               tb_decode_fast,
                                               reference_layered_decode)

# MCS14 @ 4 PRB: TBS 1256 -> BG2, Z=128 (lane-multiple)
CFG = TBConfig(1256, 2304, 4, 553 / 1024)


def noisy_llr(key_i, ebno_db, batch=4):
    pts = jnp.asarray(qam_points(4))
    kb = jax.random.fold_in(jax.random.PRNGKey(3), key_i)
    kn = jax.random.fold_in(jax.random.PRNGKey(4), key_i)
    b = binary_source(kb, (batch, CFG.tb_size))
    c = tb_encode(CFG, b)
    x = map_bits(c, pts)
    no = 1.0 / (10 ** (ebno_db / 10) * 4 * (CFG.tb_size / 2304))
    y = x + complex_awgn(kn, x.shape, no)
    return b, demap_maxlog(y, pts, jnp.asarray(no)).reshape(batch, -1)


def to_internal(llr_tb):
    """TB-level llr -> one rate-recovered codeword's internal llr."""
    from neural_rx_tpu.phy.nr.rate_match import rate_recover
    scr = jnp.asarray(CFG.scramb_seq)
    llr_int = jnp.clip(-llr_tb * (1.0 - 2.0 * scr), -20, 20)
    return rate_recover(CFG.code, llr_int, CFG.k_prime, CFG.qm)


class TestKernelVsOracle:
    def test_bit_exact_2iter(self):
        assert CFG.z == 128
        _, llr = noisy_llr(0, 3.0, batch=1)
        full = np.asarray(to_internal(llr))[0]
        oracle = reference_layered_decode(CFG.code, full, num_iter=2)
        dec = make_decoder(CFG.code, num_iter=2, interpret=True)
        kernel_bits = np.asarray(dec(jnp.asarray(full)[None]))[0]
        np.testing.assert_array_equal(kernel_bits, oracle)

    def test_noiseless_exact(self):
        info = binary_source(jax.random.PRNGKey(0), (1, CFG.code.k))
        cw = ldpc_encode(CFG.code, info)
        llr = (1.0 - 2.0 * cw) * 8.0
        llr = llr.at[..., :2 * CFG.code.z].set(0.0)
        dec = make_decoder(CFG.code, num_iter=1, interpret=True)
        bits = dec(llr)
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(cw))


class TestAlgorithmEquivalence:
    def test_layered10_vs_flooding20_waterfall(self):
        # oracle layered-10 min-sum vs flooding-20 boxplus near the
        # waterfall: block-error counts in the same ballpark
        errs_ref = errs_lay = 0
        n = 0
        for i in range(8):
            b, llr = noisy_llr(i, 3.5, batch=4)
            _, ok_ref = tb_decode(CFG, llr)
            errs_ref += int(4 - np.asarray(ok_ref).sum())
            full = np.asarray(to_internal(llr))
            for j in range(4):
                bits = reference_layered_decode(CFG.code, full[j], 10)
                k_pr = CFG.k_prime
                payload = bits[:k_pr]
                ok = np.array_equal(
                    payload[:CFG.tb_size], np.asarray(b[j]))
                errs_lay += int(not ok)
            n += 4
        assert abs(errs_lay - errs_ref) <= max(4, errs_ref), \
            (errs_lay, errs_ref, n)


class TestNonLaneMultipleZ:
    """Lifting sizes that are not lane multiples use the two-rotate
    composed cyclic shift; the kernel must stay bit-exact vs the
    oracle (pad lanes accumulate garbage but are never read back)."""

    @pytest.mark.parametrize("bg,z", [(2, 52), (2, 208)])
    def test_bit_exact_small_z(self, bg, z):
        from neural_rx_tpu.phy.nr.ldpc import get_code
        code = get_code(bg, z)
        rng = np.random.default_rng(7)
        llr = rng.normal(size=(3, code.n_full)).astype(np.float32) * 2
        dec = make_decoder(code, num_iter=3, interpret=True)
        got = np.asarray(dec(jnp.asarray(llr)))
        for i in range(3):
            want = reference_layered_decode(code, llr[i], num_iter=3)
            np.testing.assert_array_equal(got[i], want, err_msg=f"cw {i}")

    def test_bit_exact_z352_bg1(self):
        # the e2e configs' eval transport block is BG1/Z=352
        from neural_rx_tpu.phy.nr.ldpc import get_code
        code = get_code(1, 352)
        rng = np.random.default_rng(11)
        llr = rng.normal(size=(1, code.n_full)).astype(np.float32) * 2
        dec = make_decoder(code, num_iter=1, interpret=True)
        got = np.asarray(dec(jnp.asarray(llr)))[0]
        want = reference_layered_decode(code, llr[0], num_iter=1)
        np.testing.assert_array_equal(got, want)

    def test_tb_decode_fast_odd_lifting(self):
        cfg_small = TBConfig(352, 960, 2, 0.37)
        assert cfg_small.z % 128 != 0, "want a non-lane-multiple z"
        info = binary_source(jax.random.PRNGKey(5), (2, cfg_small.tb_size))
        c = tb_encode(cfg_small, info)
        llr = (2.0 * c - 1.0) * 8.0  # Sionna convention log(p1/p0)
        b_hat, ok = tb_decode_fast(cfg_small, llr, interpret=True)
        assert b_hat.shape == (2, 352)
        np.testing.assert_array_equal(np.asarray(b_hat), np.asarray(info))
        assert bool(np.all(np.asarray(ok)))


class TestTiledBatch:
    def test_tile_padding_and_order(self):
        """Batch sizes that are not tile multiples, and batch order
        through the [N, cols, Z] <-> [cols, N, Z] transposes: every
        codeword must decode exactly as the per-codeword NumPy oracle."""
        from neural_rx_tpu.phy.nr.ldpc import get_code
        from neural_rx_tpu.kernels.ldpc_pallas import (
            make_decoder, reference_layered_decode)
        code = get_code(2, 128)
        rng = np.random.default_rng(21)
        n = 5  # not a multiple of the default tile=8 -> exercises pad
        llr = rng.normal(size=(n, code.n_full)).astype(np.float32) * 2
        dec = make_decoder(code, num_iter=4, interpret=True)
        got = np.asarray(dec(jnp.asarray(llr)))
        for i in range(n):
            want = reference_layered_decode(code, llr[i], num_iter=4)
            np.testing.assert_array_equal(got[i], want, err_msg=f"cw {i}")
