"""Covariance-based LMMSE channel estimation pipeline tests
(reference baseline 'lmmse' chest: compute_cov -> s-f-t interpolator ->
detection; baseline_rx.py:168-207 + compute_cov_mat.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
class TestLMMSEChest:
    def _params(self, system):
        from neural_rx_tpu.sim.config import Parameters
        p = Parameters("test_small", system=system, training=False,
                       config_dir=TEST_CFG_DIR)
        return p

    def test_cov_matrices_structure(self):
        from neural_rx_tpu.sim.covariance import compute_cov_matrices
        p = self._params("dummy")
        p2 = self._params("baseline_lslin_lmmse")
        cf, ct, cs = compute_cov_matrices(p2, num_batches=2,
                                          batch_size=4)
        assert cf.shape == (48, 48) and ct.shape == (14, 14) \
            and cs.shape == (4, 4)
        # Hermitian PSD with unit-ish diagonal (power-normalized draws)
        for c in (cf, ct, cs):
            np.testing.assert_allclose(c, c.conj().T, atol=1e-5)
            assert np.all(np.real(np.diag(c)) > 0)
        assert abs(np.real(np.trace(cf)) / 48 - 1.0) < 0.3

    def test_exact_interpolator_matches_numpy(self, tmp_path):
        """Exact mode (lmmse_num_prbs=-1): the on-device per-call solve
        at the ACTUAL noise reproduces the closed-form numpy
        W = R_ao (R_oo + nv I)^-1 pipeline stage by stage."""
        from neural_rx_tpu.sim.covariance import compute_cov_matrices
        from neural_rx_tpu.rx.baselines import LMMSEChannelInterpolator
        p = self._params("baseline_lmmse_lmmse")
        cf, ct, cs = compute_cov_matrices(p, num_batches=2, batch_size=4)
        rg = p.transmitters[0].resource_grid
        it = LMMSEChannelInterpolator(rg, cf, ct, cs, lmmse_num_prbs=-1)
        assert it.exact
        rng = np.random.default_rng(0)
        b, ant = 2, 4
        nd = len(it.dmrs_syms)
        no = 0.0371  # deliberately NOT on the bank grid
        no_pil = no / it._pilot_pow
        h_pilots = {}
        for tx in range(rg.num_tx):
            np_t = len(it._pilot_sc[tx])
            h_pilots[tx] = jnp.asarray(
                rng.normal(size=(b, ant, nd, np_t))
                + 1j * rng.normal(size=(b, ant, nd, np_t)),
                jnp.complex64)
        got = np.asarray(jax.jit(
            lambda hp: jnp.stack([jnp.real(it(hp, no=no)),
                                  jnp.imag(it(hp, no=no))]))(h_pilots))
        got = got[0] + 1j * got[1]

        def w_np(cov, obs):
            a = cov[np.ix_(obs, obs)] + no_pil * np.eye(len(obs))
            return cov[:, obs] @ np.linalg.inv(a)

        ws = cs @ np.linalg.inv(cs + no_pil * np.eye(ant))
        wt = w_np(ct, it.dmrs_syms)
        want = []
        for tx in range(rg.num_tx):
            wf = w_np(cf, it._pilot_sc[tx])
            hp = np.asarray(h_pilots[tx])
            hp = np.einsum("ij,bjts->bits", ws, hp)
            hf = np.einsum("fp,batp->batf", wf, hp)
            want.append(np.einsum("st,batf->basf", wt, hf))
        want = np.stack(want, axis=2)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_lmmse_chest_end_to_end(self, tmp_path):
        from neural_rx_tpu.sim.covariance import compute_cov_matrices
        from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
        p = self._params("baseline_lmmse_lmmse")
        cf, ct, cs = compute_cov_matrices(p, num_batches=2, batch_size=4)
        for name, c in (("freq", cf), ("time", ct), ("space", cs)):
            np.save(tmp_path / f"{p.label}_{name}_cov_mat.npy", c)
        m = BaselineE2EModel(p, "baseline_lmmse_lmmse",
                             cov_dir=str(tmp_path))
        b, b_hat, crc = jax.jit(
            lambda k: m({}, k, 4, jnp.float32(25.0)))(jax.random.PRNGKey(0))
        bler = float(jnp.mean(
            (jnp.sum(jnp.abs(b - b_hat), -1) > 0).astype(jnp.float32)))
        # high SNR with cov-matched LMMSE chest: mostly correct
        assert bler <= 0.4, bler
