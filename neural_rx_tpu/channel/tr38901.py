"""TR 38.901 UMi/UMa stochastic geometry channel (jnp, frequency domain).

TPU-native replacement for Sionna's UMi/UMa models as configured by the
reference (`utils/parameters.py:291-354`: uplink, enable_pathloss=False,
enable_shadow_fading=False, o2i "low" with outdoor-only users, random
single-sector topology per step, BS dual-pol cross panel with the 38.901
element pattern, UT single-pol omni ULA).

Implemented subset of §7.5 (documented scope, honest approximations):
- random single-sector drops (UT distance/angle/velocity resampled per
  call, like gen_single_sector_topology in the reference training loop)
- distance-dependent LOS probability (Table 7.4.2-1)
- lognormal DS / ASA / ASD / K per scenario & LOS state (Table 7.5-6),
  drawn jointly with the inter-LSP cross-correlation matrix over
  (DS, ASA, ASD, K) from the same table (SF rows dropped: shadow
  fading is disabled in the reference setup)
- cluster delays (exponential, r_tau scaling, LOS K-correction), powers
  (delay-proportional + 3 dB per-cluster shadowing), azimuth
  angles (wrapped Gaussian around LOS, scaled by cluster AS), 20 rays
  per cluster with the fixed offset table, random coupling phases, XPR
- planar arrays: BS dual-pol (+45/-45) columns with the 38.901 element
  power pattern, UT vertical omni columns; 2D geometry (zenith fixed at
  90 deg: elevation spreads are small in the reference's 1.5 m-UT
  street-canyon setting and the arrays are single-row ULAs)
- per-ray Doppler from UT speed (uniform direction), evolved across the
  14-symbol slot
- cluster splitting of the two strongest clusters into 3 sub-clusters
  at delay offsets {0, 1.28, 2.56}*c_DS with the Table 7.5-5 fixed
  ray-to-sub-cluster assignment (§7.5 step 11)
- zenith dimension (§7.5 steps 4b/7b): lognormal ZSA (Table 7.5-6) and
  distance/height-dependent ZSD + ZOD offset (Tables 7.5-7/8 scenario
  formulas), inverse-Laplacian cluster ZOA/ZOD centered on the
  geometric LOS zenith, per-ray c_ZSA / (3/8)*10^mu_lgZSD offsets,
  [0,180] mirroring, 3D steering (sin-theta factors on both ULAs), the
  full 38.901 element pattern (vertical + horizontal cuts), and
  sin-theta Doppler. Zenith LSPs are drawn independently of the azimuth
  LSP block (the Table 7.5-6 zenith cross-correlation entries are a
  secondary effect at street-canyon spreads and are omitted).
Not implemented, with the quantitative justification for this setup
(uplink, SNR-normalized — no pathloss/shadowing — reference
parameters.py:291-354):
- spatial consistency / O2I: reference disables indoor users and drops
  users i.i.d. per step, so neither engages.

Everything is traced jnp with static shapes: the number of clusters/rays
is fixed per scenario; LOS/NLOS is handled by masking (both branches
computed), matching XLA's static-shape model.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .tdl import SPEED_OF_LIGHT

# Ray offset angles within a cluster (38.901 Table 7.5-3), M=20
RAY_OFFSETS = np.array([
    0.0447, -0.0447, 0.1413, -0.1413, 0.2492, -0.2492, 0.3715, -0.3715,
    0.5129, -0.5129, 0.6797, -0.6797, 0.8844, -0.8844, 1.1481, -1.1481,
    1.5195, -1.5195, 2.1551, -2.1551])

# Fixed ray -> sub-cluster assignment for split clusters
# (38.901 Table 7.5-5, 0-based: R1={1-8,19,20}, R2={9-12,17,18},
# R3={13-16}); one-hot [num_rays, 3]
_SUB_OF_RAY = np.zeros(20, np.int64)
_SUB_OF_RAY[[8, 9, 10, 11, 16, 17]] = 1
_SUB_OF_RAY[[12, 13, 14, 15]] = 2
RAY_SUBCLUSTER = np.eye(3, dtype=np.float32)[_SUB_OF_RAY]
# sub-cluster delay offsets in units of c_DS (38.901 §7.5 step 11)
SUBCLUSTER_DELAY_OFFSETS = np.array([0.0, 1.28, 2.56], np.float32)

# Inter-LSP cross-correlations (Table 7.5-6; SF rows dropped — shadow
# fading is disabled in the reference's setup), order (DS, ASA, ASD, K)
_LSP_XCORR = {
    ("umi", "los"): dict(ds_asa=0.8, ds_asd=0.5, ds_k=-0.7,
                         asa_asd=0.4, asa_k=-0.3, asd_k=-0.2),
    ("umi", "nlos"): dict(ds_asa=0.4, ds_asd=0.0, ds_k=0.0,
                          asa_asd=0.0, asa_k=0.0, asd_k=0.0),
    ("uma", "los"): dict(ds_asa=0.8, ds_asd=0.4, ds_k=-0.4,
                         asa_asd=0.0, asa_k=-0.2, asd_k=0.0),
    ("uma", "nlos"): dict(ds_asa=0.6, ds_asd=0.4, ds_k=0.0,
                          asa_asd=0.4, asa_k=0.0, asd_k=0.0),
}


def _lsp_cholesky(scenario: str, state: str) -> np.ndarray:
    c = _LSP_XCORR[(scenario, state)]
    m = np.array([
        [1.0, c["ds_asa"], c["ds_asd"], c["ds_k"]],
        [c["ds_asa"], 1.0, c["asa_asd"], c["asa_k"]],
        [c["ds_asd"], c["asa_asd"], 1.0, c["asd_k"]],
        [c["ds_k"], c["asa_k"], c["asd_k"], 1.0]], np.float64)
    return np.linalg.cholesky(m).astype(np.float32)

# Table 7.5-6 subsets: {scenario: {los/nlos: params}}; fc in GHz.
def _umi_params(fc):
    lf = np.log10(1 + fc)
    return {
        "los": dict(
            ds_mu=-0.24 * lf - 7.14, ds_sig=0.38,
            asd_mu=-0.05 * lf + 1.21, asd_sig=0.41,
            asa_mu=-0.08 * lf + 1.73, asa_sig=0.014 * lf + 0.28,
            zsa_mu=-0.1 * lf + 0.73, zsa_sig=-0.04 * lf + 0.34,
            k_mu=9.0, k_sig=5.0, r_tau=3.0, num_clusters=12,
            c_asd=3.0, c_asa=17.0, c_zsa=7.0,
            xpr_mu=9.0, xpr_sig=3.0, zeta=3.0,
            c_ds_ns=5.0),
        "nlos": dict(
            ds_mu=-0.24 * lf - 6.83, ds_sig=0.16 * lf + 0.28,
            asd_mu=-0.23 * lf + 1.53, asd_sig=0.11 * lf + 0.33,
            asa_mu=-0.08 * lf + 1.81, asa_sig=0.05 * lf + 0.3,
            zsa_mu=-0.04 * lf + 0.92, zsa_sig=-0.07 * lf + 0.41,
            k_mu=0.0, k_sig=0.0, r_tau=2.1, num_clusters=19,
            c_asd=10.0, c_asa=22.0, c_zsa=7.0,
            xpr_mu=8.0, xpr_sig=3.0, zeta=3.0,
            c_ds_ns=11.0),
    }


def _uma_params(fc):
    fc = max(fc, 6.0)  # 38.901: fc floor for UMa LSP formulas
    lf = np.log10(fc)
    c_ds = max(0.25, 6.5622 - 3.4084 * lf)  # Table 7.5-6 Part-2
    return {
        "los": dict(
            ds_mu=-6.955 - 0.0963 * lf, ds_sig=0.66,
            asd_mu=1.06 + 0.1114 * lf, asd_sig=0.28,
            asa_mu=1.81, asa_sig=0.20,
            zsa_mu=0.95, zsa_sig=0.16,
            k_mu=9.0, k_sig=3.5, r_tau=2.5, num_clusters=12,
            c_asd=5.0, c_asa=11.0, c_zsa=7.0,
            xpr_mu=8.0, xpr_sig=4.0, zeta=3.0,
            c_ds_ns=c_ds),
        "nlos": dict(
            ds_mu=-6.28 - 0.204 * lf, ds_sig=0.39,
            asd_mu=1.5 - 0.1144 * lf, asd_sig=0.28,
            asa_mu=2.08 - 0.27 * lf, asa_sig=0.11,
            zsa_mu=-0.3236 * lf + 1.512, zsa_sig=0.16,
            k_mu=0.0, k_sig=0.0, r_tau=2.3, num_clusters=20,
            c_asd=2.0, c_asa=15.0, c_zsa=7.0,
            xpr_mu=7.0, xpr_sig=3.0, zeta=3.0,
            c_ds_ns=c_ds),
    }


def zsd_lg_params(scenario: str, state: str, d2d, h_ut, h_bs,
                  fc_ghz: float = 2.14):
    """ZSD lognormal mean/std + mean ZOD offset (Tables 7.5-7/8 scenario
    formulas; degrees). d2d may be an array; returns (mu_lg, sigma_lg,
    zod_offset_deg)."""
    d_km = d2d / 1000.0
    if scenario == "umi":
        if state == "los":
            mu = jnp.maximum(-0.21, -14.8 * d_km + 0.01 * abs(h_ut - h_bs)
                             + 0.83)
            return mu, 0.35, jnp.zeros_like(d2d)
        mu = jnp.maximum(-0.5, -3.1 * d_km
                         + 0.01 * max(h_ut - h_bs, 0.0) + 0.2)
        off = -(10 ** (-1.5 * jnp.log10(jnp.maximum(d2d, 10.0)) + 3.3))
        return mu, 0.35, off
    # UMa (fc floored at 6 GHz like the other UMa LSP formulas)
    lf = np.log10(max(fc_ghz, 6.0))
    if state == "los":
        mu = jnp.maximum(-0.5, -2.1 * d_km - 0.01 * (h_ut - 1.5) + 0.75)
        return mu, 0.40, jnp.zeros_like(d2d)
    mu = jnp.maximum(-0.5, -2.1 * d_km - 0.01 * (h_ut - 1.5) + 0.9)
    # Table 7.5-8 ZOD offset
    off = (7.66 * lf - 5.96
           - 10 ** ((0.208 * lf - 0.782)
                    * jnp.log10(jnp.maximum(d2d, 25.0))
                    - 0.13 * lf + 2.03 - 0.07 * (h_ut - 1.5)))
    return mu, 0.49, off


def mirror_zenith(theta_deg):
    """Fold zenith angles into [0, 180] (38.901 step 7b mirroring)."""
    t = jnp.mod(theta_deg, 360.0)
    return jnp.where(t > 180.0, 360.0 - t, t)


def _los_probability(d2d, scenario):
    if scenario == "umi":
        return jnp.minimum(18.0 / d2d, 1.0) * (1 - jnp.exp(-d2d / 36.0)) \
            + jnp.exp(-d2d / 36.0)
    # UMa (h_UT <= 13 m -> C = 0)
    return jnp.minimum(18.0 / d2d, 1.0) * (1 - jnp.exp(-d2d / 63.0)) \
        + jnp.exp(-d2d / 63.0)


def _bs_element_gain_db(phi_deg, theta_deg=90.0):
    """38.901 §7.3 element power pattern: 65 deg HPBW in both cuts,
    30 dB side-lobe floor; A(theta,phi) = -min(-(A_V + A_H), 30)."""
    a_v = jnp.minimum(12.0 * ((theta_deg - 90.0) / 65.0) ** 2, 30.0)
    a_h = jnp.minimum(12.0 * (phi_deg / 65.0) ** 2, 30.0)
    return -jnp.minimum(a_v + a_h, 30.0)


class UMiUMaChannel:
    """Batched multi-UE 38.901 channel; one random drop per call.

    Call signature matches the framework channel interface:
    (key, batch, num_tx, num_symbols, num_sc, scs) ->
    h [batch, num_rx_ant, num_tx, num_tx_ant, num_symbols, num_sc].
    """

    def __init__(self, scenario: str, carrier_frequency: float,
                 num_rx_ant: int = 4, num_tx_ant: int = 2,
                 min_speed: float = 0.0, max_speed: float = 0.0,
                 normalize: bool = False, cell_radius: float = 120.0,
                 min_dist: float = 10.0, cluster_split: bool = True):
        assert scenario in ("umi", "uma")
        self.cluster_split = cluster_split
        self.lsp_chol = {s: _lsp_cholesky(scenario, s)
                         for s in ("los", "nlos")}
        self.scenario = scenario
        self.fc = carrier_frequency
        fc_ghz = carrier_frequency / 1e9
        self.params = (_umi_params(fc_ghz) if scenario == "umi"
                       else _uma_params(fc_ghz))
        self.num_rx_ant = num_rx_ant
        self.num_tx_ant = num_tx_ant
        self.min_speed = min_speed
        self.max_speed = max(max_speed, min_speed)
        self.normalize = normalize
        self.cell_radius = cell_radius if scenario == "umi" else 250.0
        self.min_dist = min_dist if scenario == "umi" else 35.0
        self.h_bs = 10.0 if scenario == "umi" else 25.0
        self.h_ut = 1.5
        self.wavelength = SPEED_OF_LIGHT / carrier_frequency
        # BS: dual-pol cross columns (num_rx_ant/2 columns x 2 pols),
        # half-wavelength spacing ULA. UT: vertical single-pol columns.
        self.num_bs_cols = max(num_rx_ant // 2, 1)
        self.bs_dual_pol = num_rx_ant >= 2
        # max cluster count over LOS/NLOS for static shapes
        self.n_cl = max(self.params["los"]["num_clusters"],
                        self.params["nlos"]["num_clusters"])
        self.n_rays = 20

    def _lsp(self, key, state, shape):
        """Sample jointly-correlated lognormal LSPs for one LOS state.

        Standard normals over (DS, ASA, ASD, K) are colored by the
        Cholesky factor of the Table 7.5-6 cross-correlation matrix
        before the per-LSP mu/sigma affine map.
        """
        p = self.params[state]
        n = jax.random.normal(key, shape + (4,))
        chol = jnp.asarray(self.lsp_chol[state])
        x = jnp.einsum("...j,ij->...i", n, chol)
        ds = 10 ** (p["ds_mu"] + p["ds_sig"] * x[..., 0])
        asa = 10 ** (p["asa_mu"] + p["asa_sig"] * x[..., 1])
        asd = 10 ** (p["asd_mu"] + p["asd_sig"] * x[..., 2])
        asa = jnp.minimum(asa, 104.0)
        asd = jnp.minimum(asd, 104.0)
        k_db = p["k_mu"] + p["k_sig"] * x[..., 3]
        return ds, asa, asd, k_db

    def __call__(self, key, batch_size: int, num_tx: int,
                 num_symbols: int, num_sc: int, subcarrier_spacing: float,
                 symbol_duration: float | None = None) -> jnp.ndarray:
        if symbol_duration is None:
            symbol_duration = 1.0 / subcarrier_spacing
        ks = list(jax.random.split(key, 16))
        B, T = batch_size, num_tx
        NC, NR = self.n_cl, self.n_rays
        shape = (B, T)

        # ---- topology drop -------------------------------------------
        u = jax.random.uniform(ks[0], shape)
        d2d = jnp.sqrt(u * (self.cell_radius ** 2 - self.min_dist ** 2)
                       + self.min_dist ** 2)
        phi_los_aod = jax.random.uniform(ks[1], shape, minval=-60.0,
                                         maxval=60.0)  # sector
        phi_los_aoa = jax.random.uniform(ks[2], shape, minval=-180.0,
                                         maxval=180.0)
        speed = jax.random.uniform(ks[3], shape, minval=self.min_speed,
                                   maxval=self.max_speed + 1e-9)
        v_dir = jax.random.uniform(ks[4], shape, minval=-np.pi,
                                   maxval=np.pi)
        p_los = _los_probability(d2d, self.scenario)
        is_los = (jax.random.uniform(ks[5], shape) < p_los)

        # ---- LSPs: sample both states, select by mask -----------------
        lsp_l = self._lsp(ks[6], "los", shape)
        lsp_n = self._lsp(ks[7], "nlos", shape)
        sel = lambda a, b: jnp.where(is_los, a, b)
        ds = sel(lsp_l[0], lsp_n[0])
        asa = sel(lsp_l[1], lsp_n[1])
        asd = sel(lsp_l[2], lsp_n[2])
        # K only for LOS; -100 dB (linear ~0) keeps all lanes finite —
        # an actual -inf here propagates NaN through where() on TPU
        k_db = jnp.where(is_los, lsp_l[3], -100.0)
        k_lin = jnp.where(is_los, 10 ** (k_db / 10), 0.0)
        pl, pn = self.params["los"], self.params["nlos"]
        r_tau = sel(jnp.full(shape, pl["r_tau"]),
                    jnp.full(shape, pn["r_tau"]))
        c_asa = sel(jnp.full(shape, pl["c_asa"]),
                    jnp.full(shape, pn["c_asa"]))
        c_asd = sel(jnp.full(shape, pl["c_asd"]),
                    jnp.full(shape, pn["c_asd"]))
        xpr_mu = sel(jnp.full(shape, pl["xpr_mu"]),
                     jnp.full(shape, pn["xpr_mu"]))
        xpr_sig = sel(jnp.full(shape, pl["xpr_sig"]),
                      jnp.full(shape, pn["xpr_sig"]))
        n_active = sel(jnp.full(shape, pl["num_clusters"]),
                       jnp.full(shape, pn["num_clusters"]))
        cl_mask = (jnp.arange(NC)[None, None, :]
                   < n_active[..., None]).astype(jnp.float32)

        # ---- zenith LSPs (step 4b; independent of the azimuth block) --
        kz = [jax.random.fold_in(ks[15], i) for i in range(8)]
        fc_ghz = self.fc / 1e9
        zsa = jnp.minimum(sel(
            10 ** (pl["zsa_mu"] + pl["zsa_sig"]
                   * jax.random.normal(kz[0], shape)),
            10 ** (pn["zsa_mu"] + pn["zsa_sig"]
                   * jax.random.normal(kz[1], shape))), 52.0)
        zl_mu, zl_sig, zl_off = zsd_lg_params(self.scenario, "los", d2d,
                                              self.h_ut, self.h_bs, fc_ghz)
        zn_mu, zn_sig, zn_off = zsd_lg_params(self.scenario, "nlos", d2d,
                                              self.h_ut, self.h_bs, fc_ghz)
        zsd = jnp.minimum(sel(
            10 ** (zl_mu + zl_sig * jax.random.normal(kz[2], shape)),
            10 ** (zn_mu + zn_sig * jax.random.normal(kz[3], shape))), 52.0)
        mu_lg_zsd = sel(zl_mu, zn_mu)
        zod_off = sel(zl_off, zn_off)
        c_zsa = sel(jnp.full(shape, pl["c_zsa"]),
                    jnp.full(shape, pn["c_zsa"]))
        # geometric LOS zenith: arrival at the BS / departure at the UT
        d3d = jnp.sqrt(d2d ** 2 + (self.h_bs - self.h_ut) ** 2)
        th_los_zoa = jnp.rad2deg(jnp.arccos(
            (self.h_ut - self.h_bs) / d3d))  # UT below BS -> >90 deg
        th_los_zod = 180.0 - th_los_zoa

        # ---- cluster delays & powers (7.5 steps 5-6) ------------------
        u_tau = jax.random.uniform(ks[8], shape + (NC,), minval=1e-6,
                                   maxval=1.0)
        tau_p = -r_tau[..., None] * ds[..., None] * jnp.log(u_tau)
        tau = jnp.sort(tau_p - jnp.min(tau_p, -1, keepdims=True), axis=-1)
        zeta = sel(jnp.full(shape, pl["zeta"]), jnp.full(shape, pn["zeta"]))
        z = zeta[..., None] * jax.random.normal(ks[9], shape + (NC,))
        p_cl = jnp.exp(-tau * (r_tau[..., None] - 1)
                       / (r_tau[..., None] * ds[..., None])) \
            * 10 ** (-z / 10)
        p_cl = p_cl * cl_mask
        p_cl = p_cl / jnp.sum(p_cl, -1, keepdims=True)
        # LOS: scale NLOS power and add specular on cluster 1 (step 6)
        kl = k_lin[..., None]
        p_cl = p_cl / (1 + kl)
        p_spec = k_lin / (1 + k_lin)  # [B, T]
        # LOS delay scaling of tau (38.901 eq. 7.5-3/4)
        k_db_s = jnp.where(is_los, k_db, 0.0)
        c_tau = 0.7705 - 0.0433 * k_db_s + 0.0002 * k_db_s ** 2 \
            + 0.000017 * k_db_s ** 3
        tau = jnp.where(is_los[..., None], tau / jnp.maximum(c_tau[..., None],
                                                             1e-3), tau)

        # ---- cluster splitting (step 11): two strongest clusters ------
        # get 3 sub-delays at {0, 1.28, 2.56}*c_DS; rays are assigned to
        # sub-clusters by the fixed Table 7.5-5 map. Unsplit clusters
        # keep all three sub-delays equal to tau, so summing the three
        # masked ray-subsets reproduces the plain per-cluster sum.
        if self.cluster_split:
            order = jnp.argsort(-p_cl, axis=-1)
            ranks = jnp.argsort(order, axis=-1)  # 0 = strongest
            is_split = ((ranks < 2) & (cl_mask > 0)).astype(jnp.float32)
        else:
            is_split = jnp.zeros_like(p_cl)
        c_ds_s = sel(jnp.full(shape, pl["c_ds_ns"]),
                     jnp.full(shape, pn["c_ds_ns"])) * 1e-9
        sub_off = jnp.asarray(SUBCLUSTER_DELAY_OFFSETS)
        tau_sub = tau[..., None] + (is_split * c_ds_s[..., None])[..., None] \
            * sub_off  # [B,T,NC,3]
        ray_sub = jnp.asarray(RAY_SUBCLUSTER)  # [NR,3]

        # ---- azimuth angles (step 7, wrapped-Gaussian method) ---------
        c_phi_n = {8: 0.703, 10: 0.737, 11: 0.753, 12: 0.779, 14: 0.810,
                   15: 0.831, 16: 0.844, 19: 0.889, 20: 0.957}
        c_phi = sel(jnp.full(shape, c_phi_n.get(pl["num_clusters"], 0.779)
                             * (1.1035 - 0.028 * k_db_s - 0.002 * k_db_s**2
                                + 0.0001 * k_db_s ** 3)),
                    jnp.full(shape, c_phi_n.get(pn["num_clusters"], 0.889)))

        def _power_neg_log():
            pmax = jnp.max(p_cl, -1, keepdims=True)
            return jnp.maximum(
                -jnp.log(p_cl / jnp.maximum(pmax, 1e-12) + 1e-12), 0.0)

        def _cluster_spread_angles(raw_angle, center, spread_deg, key1,
                                   key2):
            """Shared step-7 scaffolding: random per-cluster sign X_n,
            Gaussian perturbation Y_n ~ N(0, (spread/7)^2), center."""
            xn = jax.random.choice(key1, jnp.asarray([-1.0, 1.0]),
                                   shape + (NC,))
            yn = (spread_deg[..., None] / 7.0) \
                * jax.random.normal(key2, shape + (NC,))
            return xn * raw_angle + yn + center[..., None]

        def cluster_angles(center, spread_deg, key1, key2):
            # wrapped-Gaussian inverse (7.5-9)
            phi_p = 2 * (spread_deg[..., None] / 1.4) \
                * jnp.sqrt(_power_neg_log()) \
                / jnp.maximum(c_phi[..., None], 1e-6)
            return _cluster_spread_angles(phi_p, center, spread_deg,
                                          key1, key2)

        phi_aoa = cluster_angles(phi_los_aoa, asa, ks[10],
                                 jax.random.fold_in(ks[10], 1))
        phi_aod = cluster_angles(phi_los_aod, asd, ks[11],
                                 jax.random.fold_in(ks[11], 1))
        # rays: cluster angle + c_AS * offsets
        offs = jnp.asarray(RAY_OFFSETS, jnp.float32)
        phi_aoa_r = phi_aoa[..., None] + c_asa[..., None, None] * offs
        phi_aod_r = phi_aod[..., None] + c_asd[..., None, None] * offs

        # ---- zenith angles (step 7b, inverse-Laplacian method) --------
        c_th_n = {8: 0.889, 10: 0.957, 11: 1.031, 12: 1.104, 15: 1.1088,
                  16: 1.1088, 19: 1.184, 20: 1.178}
        c_th = sel(jnp.full(shape, c_th_n.get(pl["num_clusters"], 1.104))
                   * (1.3086 + 0.0339 * k_db_s - 0.0077 * k_db_s ** 2
                      + 0.0002 * k_db_s ** 3),
                   jnp.full(shape, c_th_n.get(pn["num_clusters"], 1.184)))

        def cluster_zenith(center, spread_deg, key1, key2):
            # Laplacian inverse (7.5-14)
            th_p = spread_deg[..., None] * _power_neg_log() \
                / jnp.maximum(c_th[..., None], 1e-6)
            return _cluster_spread_angles(th_p, center, spread_deg,
                                          key1, key2)

        th_zoa = cluster_zenith(th_los_zoa, zsa, kz[4], kz[5])
        th_zod = cluster_zenith(th_los_zod + zod_off, zsd, kz[6], kz[7])
        # rays: ZOA spreads by c_ZSA, ZOD by (3/8)*10^mu_lgZSD (7.5-20)
        th_zoa_r = mirror_zenith(
            th_zoa[..., None] + c_zsa[..., None, None] * offs)
        th_zod_r = mirror_zenith(
            th_zod[..., None]
            + (3.0 / 8.0) * (10 ** mu_lg_zsd)[..., None, None] * offs)
        sin_zoa_r = jnp.sin(jnp.deg2rad(th_zoa_r))
        sin_zod_r = jnp.sin(jnp.deg2rad(th_zod_r))

        # ---- per-ray random phases & XPR (step 9-10) ------------------
        # field matrix entries for [theta-theta, theta-phi, phi-theta,
        # phi-phi]; with 2D geometry we track the 2x2 pol matrix directly
        ph = jax.random.uniform(ks[12], shape + (NC, NR, 4),
                                minval=-np.pi, maxval=np.pi)
        xpr_db = xpr_mu[..., None, None] + xpr_sig[..., None, None] \
            * jax.random.normal(ks[13], shape + (NC, NR))
        kappa_inv = 10 ** (-xpr_db / 10)  # 1/XPR linear
        sq = jnp.sqrt(kappa_inv)
        # polarization coupling matrix entries (38.901 eq. 7.5-22)
        m_tt = jnp.exp(1j * ph[..., 0])
        m_tp = sq * jnp.exp(1j * ph[..., 1])
        m_pt = sq * jnp.exp(1j * ph[..., 2])
        m_pp = jnp.exp(1j * ph[..., 3])

        # ---- antenna responses ----------------------------------------
        # BS ULA columns at lambda/2 along y: spatial frequency
        # sin(zenith)*sin(azimuth) (3D geometry; zenith from step 7b).
        d_bs = 0.5
        ar = jnp.deg2rad(phi_aoa_r)  # [B,T,NC,NR]
        col_idx = jnp.arange(self.num_bs_cols)
        steer_bs = jnp.exp(
            1j * 2 * np.pi * d_bs
            * col_idx[None, None, None, None, :]
            * (sin_zoa_r * jnp.sin(ar))[..., None])  # [B,T,NC,NR,cols]
        elem_gain = 10 ** (_bs_element_gain_db(phi_aoa_r, th_zoa_r) / 20.0)
        steer_bs = steer_bs * elem_gain[..., None]
        # UT ULA over AoD, omni elements, single pol (vertical)
        d_ut = 0.5
        ad = jnp.deg2rad(phi_aod_r)
        ut_idx = jnp.arange(self.num_tx_ant)
        steer_ut = jnp.exp(
            1j * 2 * np.pi * d_ut
            * ut_idx[None, None, None, None, :]
            * (sin_zod_r * jnp.sin(ad))[..., None])  # [B,T,NC,NR,ut]

        # BS dual-pol: +45/-45 slant -> field components (F_theta, F_phi)
        # = (cos45, +/- sin45); UT vertical: (1, 0).
        # ray amplitude on BS pol a: F_a^T M F_ut = cos45*m_tt +- sin45*m_pt
        c45 = 1 / np.sqrt(2)
        amp_p = c45 * (m_tt + m_pt)  # +45 pol
        amp_m = c45 * (m_tt - m_pt)  # -45 pol

        # ---- Doppler over the slot ------------------------------------
        t = jnp.arange(num_symbols, dtype=jnp.float32) * symbol_duration
        v_ms = speed[..., None, None]
        # Doppler is set by the ray direction AT THE MOVING TERMINAL —
        # the UT, i.e. the departure side in this uplink convention:
        # nu = (v/lambda) * sin(theta_ZOD) * cos(phi_AOD - v_dir)
        doppler = (v_ms / self.wavelength) * sin_zod_r \
            * jnp.cos(jnp.deg2rad(phi_aod_r) - v_dir[..., None, None])
        ray_phase_t = jnp.exp(
            1j * 2 * np.pi * doppler[..., None] * t)  # [B,T,NC,NR,sym]

        # ---- combine: per-cluster ray sum -> CIR taps ------------------
        p_ray = jnp.sqrt(p_cl[..., None] / NR)  # [B,T,NC,1]

        def mimo_taps(amp_pol):
            # a[B,T,NC,NR] complex pol amplitude
            w = (p_ray * amp_pol)[..., None] * ray_phase_t  # [B,T,NC,NR,sym]
            # steering outer product, rays summed per sub-cluster
            # g[B,T,3,NC,sym,cols,ut]
            g = jnp.einsum("btcrs,rk,btcrm,btcrn->btkcsmn", w, ray_sub,
                           steer_bs, steer_ut)
            return g

        g_p = mimo_taps(amp_p)
        g_m = mimo_taps(amp_m) if self.bs_dual_pol else None

        # LOS specular ray on the direct path (cluster 0 delay)
        sin_zoa_los = jnp.sin(jnp.deg2rad(th_los_zoa))
        sin_zod_los = jnp.sin(jnp.deg2rad(th_los_zod))
        los_bs = jnp.exp(1j * 2 * np.pi * d_bs * col_idx[None, None, :]
                         * (sin_zoa_los
                            * jnp.sin(jnp.deg2rad(phi_los_aoa)))[..., None]) \
            * (10 ** (_bs_element_gain_db(phi_los_aoa,
                                          th_los_zoa) / 20.0))[..., None]
        los_ut = jnp.exp(1j * 2 * np.pi * d_ut * ut_idx[None, None, :]
                         * (sin_zod_los
                            * jnp.sin(jnp.deg2rad(phi_los_aod)))[..., None])
        los_phase0 = jax.random.uniform(ks[14], shape, minval=-np.pi,
                                        maxval=np.pi)
        dop_los = (speed / self.wavelength) * sin_zod_los \
            * jnp.cos(jnp.deg2rad(phi_los_aod) - v_dir)
        los_t = jnp.exp(1j * (los_phase0[..., None]
                              + 2 * np.pi * dop_los[..., None] * t))
        los_amp = jnp.sqrt(p_spec)[..., None] * los_t  # [B,T,sym]
        los_tap = jnp.einsum("bts,btm,btn->btsmn", los_amp,
                             los_bs * c45, los_ut)

        # ---- project taps onto subcarriers -----------------------------
        f = (jnp.arange(num_sc) - (num_sc - 1) / 2.0) * subcarrier_spacing
        phase = jnp.exp(-1j * 2 * np.pi * f[None, None, None, None, :]
                        * tau_sub[..., None])  # [B,T,NC,3,sc]

        def to_cfr(g):
            # g[B,T,3,NC,sym,cols,ut] x phase[B,T,NC,3,sc]
            return jnp.einsum("btkcsmn,btckf->btsmnf", g, phase)

        h_p = to_cfr(g_p)  # [B,T,sym,cols,ut,sc]
        # add LOS on the first cluster's delay (tau[...,0])
        los_ph = jnp.exp(-1j * 2 * np.pi * f[None, None, :]
                         * tau[..., 0][..., None])  # [B,T,sc]
        h_p = h_p + jnp.einsum("btsmn,btf->btsmnf", los_tap, los_ph)
        if self.bs_dual_pol:
            h_m = to_cfr(g_m)
            h_m = h_m + jnp.einsum("btsmn,btf->btsmnf",
                                   jnp.einsum("bts,btm,btn->btsmn",
                                              los_amp, los_bs * (-c45),
                                              los_ut), los_ph)
            # interleave pols: rx antennas = [col0+, col0-, col1+, ...]
            h = jnp.stack([h_p, h_m], axis=4)  # [B,T,sym,cols,2,ut,sc]
            h = h.reshape(h.shape[:3] + (self.num_bs_cols * 2,)
                          + h.shape[5:])
        else:
            h = h_p
        # -> [B, rx_ant, T, ut, sym, sc]
        h = jnp.transpose(h, (0, 3, 1, 4, 2, 5))
        if self.normalize:
            mp = jnp.mean(jnp.abs(h) ** 2, axis=(1, 3, 4, 5), keepdims=True)
            h = h / jnp.sqrt(mp).astype(h.dtype)
        return h.astype(jnp.complex64)
