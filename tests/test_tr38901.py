"""Statistical tests for the TR 38.901 UMi/UMa channel subset
(reference parity target: Sionna UMi/UMa as configured in
utils/parameters.py:291-354 — uplink, no pathloss/shadowing)."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_rx_tpu.channel.tr38901 import UMiUMaChannel, _los_probability

FC = 2.14e9
SCS = 30e3


def make(scenario="umi", **kw):
    kw.setdefault("num_rx_ant", 4)
    kw.setdefault("num_tx_ant", 2)
    return UMiUMaChannel(scenario, FC, **kw)


class TestUMi:
    def test_shape_and_finite(self):
        ch = make()
        h = ch(jax.random.PRNGKey(0), 4, 2, 14, 48, SCS)
        assert h.shape == (4, 4, 2, 2, 14, 48)
        assert np.isfinite(np.asarray(h)).all()

    def test_mean_power_order_unity(self):
        # powers normalized per drop (sum of cluster powers = 1); array
        # gains vary with the 3D element pattern (the vertical cut
        # attenuates close-in UTs sitting well below the BS horizon),
        # so only order-of-magnitude
        ch = make()
        h = np.asarray(ch(jax.random.PRNGKey(1), 64, 1, 1, 16, SCS))
        p = (np.abs(h) ** 2).mean()
        assert 0.03 < p < 3.0, p

    def test_frequency_selectivity(self):
        ch = make()
        h = np.asarray(ch(jax.random.PRNGKey(2), 128, 1, 1, 256, SCS))
        h0 = h[:, 0, 0, 0, 0]
        c_near = np.mean(h0[:, :-1] * np.conj(h0[:, 1:]))
        c_far = np.mean(h0[:, :-128] * np.conj(h0[:, 128:]))
        p = np.mean(np.abs(h0) ** 2)
        assert abs(c_near) / p > 0.8       # adjacent SCs correlated
        assert abs(c_far) / p < 0.7        # distant SCs decorrelate

    def test_time_variation_with_speed(self):
        slow = make(min_speed=0.0, max_speed=0.0)
        fast = make(min_speed=56.0, max_speed=56.0)
        key = jax.random.PRNGKey(3)
        hs = np.asarray(slow(key, 64, 1, 14, 4, SCS))
        hf = np.asarray(fast(key, 64, 1, 14, 4, SCS))
        def var_t(h):
            return np.mean(np.abs(h[..., -1, :] - h[..., 0, :]) ** 2) \
                / np.mean(np.abs(h) ** 2)
        assert var_t(hs) < 1e-6          # static users -> static channel
        assert var_t(hf) > 1e-3          # 56 m/s -> visible evolution

    def test_users_independent(self):
        ch = make()
        h = np.asarray(ch(jax.random.PRNGKey(4), 512, 2, 1, 1, SCS))
        u1, u2 = h[:, 0, 0, 0, 0, 0], h[:, 0, 1, 0, 0, 0]
        p = np.sqrt(np.mean(np.abs(u1) ** 2) * np.mean(np.abs(u2) ** 2))
        assert abs(np.mean(u1 * np.conj(u2))) / p < 0.1

    def test_los_probability_curve(self):
        d = jnp.asarray([1.0, 18.0, 50.0, 200.0])
        p = np.asarray(_los_probability(d, "umi"))
        assert p[0] == 1.0
        assert np.all(np.diff(p) <= 0)  # monotone decreasing
        assert p[-1] < 0.25

    def test_uma_variant(self):
        ch = make("uma")
        h = ch(jax.random.PRNGKey(5), 2, 2, 14, 48, SCS)
        assert h.shape == (2, 4, 2, 2, 14, 48)
        assert np.isfinite(np.asarray(h)).all()

    def test_rx_antenna_correlation_structure(self):
        # dual-pol pairs on the same column should be less correlated
        # than... at minimum, all antennas carry equal average power
        ch = make()
        h = np.asarray(ch(jax.random.PRNGKey(6), 256, 1, 1, 8, SCS))
        p_ant = (np.abs(h[:, :, 0, 0, 0]) ** 2).mean(axis=(0, 2))
        assert p_ant.std() / p_ant.mean() < 0.2


class TestLSPCrossCorrelation:
    """The (DS, ASA, ASD, K) LSPs must carry the Table 7.5-6
    cross-correlations (SF rows dropped: shadow fading disabled)."""

    def _corrs(self, scenario, state, n=60000):
        ch = make(scenario)
        ds, asa, asd, k_db = ch._lsp(jax.random.PRNGKey(7), state, (n,))
        lds = np.log10(np.asarray(ds))
        lasa = np.log10(np.asarray(asa))
        lasd = np.log10(np.asarray(asd))
        k = np.asarray(k_db)
        c = lambda a, b: float(np.corrcoef(a, b)[0, 1])
        return dict(ds_asa=c(lds, lasa), ds_asd=c(lds, lasd),
                    ds_k=c(lds, k), asa_asd=c(lasa, lasd))

    def test_umi_los(self):
        # 104-deg angle clipping shaves the tails, so tolerances are
        # loose for ASA/ASD pairs and tight for the unclipped DS-K pair
        r = self._corrs("umi", "los")
        assert abs(r["ds_k"] - (-0.7)) < 0.03
        assert abs(r["ds_asa"] - 0.8) < 0.1
        assert abs(r["ds_asd"] - 0.5) < 0.1
        assert abs(r["asa_asd"] - 0.4) < 0.1

    def test_umi_nlos(self):
        r = self._corrs("umi", "nlos")
        assert abs(r["ds_asa"] - 0.4) < 0.1
        assert abs(r["ds_asd"]) < 0.05
        assert abs(r["asa_asd"]) < 0.05

    def test_uma_nlos(self):
        r = self._corrs("uma", "nlos")
        assert abs(r["ds_asa"] - 0.6) < 0.1
        assert abs(r["ds_asd"] - 0.4) < 0.1
        assert abs(r["asa_asd"] - 0.4) < 0.1


class TestClusterSplit:
    def test_zero_cds_identity(self):
        """With c_DS forced to 0 the split path must reproduce the
        unsplit channel exactly (validates the masked ray-subset
        decomposition; both paths consume identical randomness)."""
        ch_off = make(cluster_split=False)
        ch_on = make()
        for st in ("los", "nlos"):
            ch_on.params[st] = dict(ch_on.params[st], c_ds_ns=0.0)
        k = jax.random.PRNGKey(3)
        h1 = np.asarray(ch_off(k, 4, 2, 14, 48, SCS))
        h2 = np.asarray(ch_on(k, 4, 2, 14, 48, SCS))
        np.testing.assert_allclose(h1, h2, rtol=1e-4, atol=1e-5)

    def test_split_preserves_power(self):
        """Splitting only moves sub-cluster delays; mean power over
        drops/subcarriers must be statistically unchanged."""
        k = jax.random.PRNGKey(11)
        p1 = float(np.mean(np.abs(np.asarray(
            make(cluster_split=False)(k, 32, 2, 14, 48, SCS))) ** 2))
        p2 = float(np.mean(np.abs(np.asarray(
            make()(k, 32, 2, 14, 48, SCS))) ** 2))
        assert abs(p1 - p2) / p1 < 0.05

    def test_split_increases_delay_spread(self):
        """With a large forced c_DS the frequency decorrelation must
        increase (sanity that split delays actually take effect)."""
        def freq_corr(ch, key):
            h = np.asarray(ch(key, 64, 1, 1, 128, SCS))[..., 0, :]
            h0 = h[..., :-8]
            h8 = h[..., 8:]
            num = np.abs(np.mean(h0 * np.conj(h8)))
            den = np.mean(np.abs(h0) ** 2)
            return num / den
        ch_big = make()
        for st in ("los", "nlos"):
            ch_big.params[st] = dict(ch_big.params[st], c_ds_ns=400.0)
        k = jax.random.PRNGKey(5)
        c_off = freq_corr(make(cluster_split=False), k)
        c_big = freq_corr(ch_big, k)
        assert c_big < c_off - 0.01


class TestZenith:
    def test_mirror_folding(self):
        from neural_rx_tpu.channel.tr38901 import mirror_zenith
        t = mirror_zenith(jnp.asarray([190.0, -10.0, 90.0, 0.0, 180.0,
                                       365.0]))
        np.testing.assert_allclose(np.asarray(t),
                                   [170.0, 10.0, 90.0, 0.0, 180.0, 5.0])

    def test_zsd_params_distance_behavior(self):
        from neural_rx_tpu.channel.tr38901 import zsd_lg_params
        d = jnp.asarray([15.0, 100.0, 400.0])
        mu_n, sig, off = zsd_lg_params("umi", "nlos", d, 1.5, 10.0)
        # ZSD shrinks (to the floor) and the NLOS ZOD offset decays
        # toward 0 with distance
        assert mu_n[0] >= mu_n[1] >= mu_n[2]
        assert np.all(np.asarray(off) <= 0)
        assert abs(float(off[2])) < abs(float(off[0]))
        mu_l, _, off_l = zsd_lg_params("umi", "los", d, 1.5, 10.0)
        np.testing.assert_allclose(np.asarray(off_l), 0.0)
        assert np.all(np.asarray(mu_l) >= -0.21 - 1e-6)

    def test_element_pattern_3d(self):
        from neural_rx_tpu.channel.tr38901 import _bs_element_gain_db
        # boresight
        assert float(_bs_element_gain_db(jnp.float32(0.0),
                                         jnp.float32(90.0))) == 0.0
        # vertical cut: 65 deg off-boresight in zenith -> -12 dB
        np.testing.assert_allclose(
            float(_bs_element_gain_db(jnp.float32(0.0), jnp.float32(25.0))),
            -12.0, atol=1e-5)
        # combined cuts saturate at the 30 dB floor
        assert float(_bs_element_gain_db(jnp.float32(180.0),
                                         jnp.float32(0.0))) == -30.0

    def test_los_zenith_geometry_enters_channel(self):
        # a UT far below the BS (close-in) must see a weaker mean
        # channel than the same drop radius-forced far away, because the
        # vertical element cut attenuates steep arrival angles
        near = make(cell_radius=12.0, min_dist=10.0)
        far = make(cell_radius=119.0, min_dist=110.0)
        hn = np.asarray(near(jax.random.PRNGKey(7), 128, 1, 1, 8, SCS))
        hf = np.asarray(far(jax.random.PRNGKey(7), 128, 1, 1, 8, SCS))
        pn_ = (np.abs(hn) ** 2).mean()
        pf = (np.abs(hf) ** 2).mean()
        assert pn_ < pf
