"""Tests for auxiliary modules: metrics/goodput, trajectory sampling,
synthetic dataset generation, Aerial data tooling, ZF precoder,
mixed-MCS model wiring, debug utils."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


class TestGoodput:
    def test_formula(self):
        from neural_rx_tpu.sim.metrics import calculate_goodput
        gp = calculate_goodput([0.0, 0.5, 1.0], tb_size=1000,
                               num_res=2000)
        np.testing.assert_allclose(gp, [0.5, 0.25, 0.0])

    def test_pilotless_gain(self):
        from neural_rx_tpu.sim.metrics import calculate_goodput
        with_p = calculate_goodput(0.0, 1000, 2000, 200, True)
        without = calculate_goodput(0.0, 1000, 2000, 200, False)
        assert without > with_p

    def test_csv_plot_roundtrip(self, tmp_path):
        from neural_rx_tpu.sim.simber import save_results
        from neural_rx_tpu.sim.metrics import export_csv, plot_results, \
            plot_goodput
        rp = str(tmp_path / "r.pkl")
        save_results(rp, "lbl", "sysA", 2, 0, [0, 1, 2],
                     [1e-1, 1e-2, 1e-3], [0.5, 0.1, 0.01])
        export_csv(rp, str(tmp_path / "r.csv"))
        assert "sysA" in open(tmp_path / "r.csv").read()
        plot_results(rp, str(tmp_path / "r.png"))
        plot_goodput(rp, str(tmp_path / "gp.png"), 1000, 2000)
        assert os.path.getsize(tmp_path / "r.png") > 0
        assert os.path.getsize(tmp_path / "gp.png") > 0


class TestTrajectory:
    def test_equally_spaced(self):
        from neural_rx_tpu.sim.trajectory import sample_along_trajectory
        wp = [[0, 0, 1.5], [10, 0, 1.5], [10, 10, 1.5]]
        pos, vel = sample_along_trajectory(wp, 20, speed_mps=2.0)
        assert pos.shape == (20, 3)
        d = np.linalg.norm(np.diff(pos, axis=0), axis=1)
        assert np.allclose(d, d[0], atol=1e-6)
        assert np.allclose(np.linalg.norm(vel, axis=1), 2.0)

    def test_synthetic_dataset_usable(self, tmp_path):
        from neural_rx_tpu.sim.trajectory import \
            generate_synthetic_cir_dataset
        from neural_rx_tpu.channel.dataset import DatasetChannel
        path = str(tmp_path / "site.cirbin")
        generate_synthetic_cir_dataset(
            path, [[0, 0, 1.5], [50, 0, 1.5]], 24, bs_position=[0, 30, 20])
        ch = DatasetChannel(path, training=True, num_tx=2)
        h = ch(jax.random.PRNGKey(0), 2, 2, 14, 48, 30e3)
        assert h.shape == (2, 4, 2, 2, 14, 48)
        assert np.isfinite(np.abs(np.asarray(h))).all()


class TestZFPrecoder:
    def test_zero_forcing(self):
        from neural_rx_tpu.phy.misc import zf_precoder
        key = jax.random.PRNGKey(0)
        h = (jax.random.normal(key, (16, 2, 4))
             + 1j * jax.random.normal(jax.random.PRNGKey(1), (16, 2, 4))
             ).astype(jnp.complex64)
        w = zf_precoder(h)
        hw = jnp.einsum("...rt,...ts->...rs", h, w)
        off = np.asarray(hw - jnp.diagonal(hw, axis1=-2, axis2=-1)[
            ..., None] * jnp.eye(2))
        # off-diagonal (inter-stream) terms nulled
        assert np.abs(off * (1 - np.eye(2))).max() < 1e-4
        # unit column norms
        norms = np.linalg.norm(np.asarray(w), axis=-2)
        assert np.allclose(norms, 1.0, atol=1e-5)


class TestAerialTooling:
    def test_generator_and_evaluator(self):
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        from neural_rx_tpu.deploy.aerial import AerialNRX
        from neural_rx_tpu.deploy.data_tools import (
            AerialDataGenerator, AerialDataEvaluator,
            export_static_indices)
        p = Parameters("test_small", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        p.nrx_dtype = jnp.float32
        model = E2EModel(p, training=False)
        params = model.init_params(jax.random.PRNGKey(0))
        engine = AerialNRX(model.receiver.rg, model.receiver.cgnn_cfg,
                           dtype=jnp.float32)
        gen = AerialDataGenerator(model, engine)
        inputs, labels = gen(jax.random.PRNGKey(1), 2, 30.0)
        assert inputs[0].shape == (2, 48, 14, 4)
        assert inputs[2].shape[1] == engine.num_pilots
        llr, h_hat = engine(params, *inputs)
        assert llr.shape == (2, 2, 48, 14, 4)
        assert h_hat.shape == (2, 2, 48, 14, 8)  # 2*rx_ant channels
        ev = AerialDataEvaluator(model)
        out = ev(llr, labels)
        assert 0.0 <= out["coded_ber"] <= 1.0
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            export_static_indices(engine, os.path.join(td, "idx.npz"))
            d = np.load(os.path.join(td, "idx.npz"))
            assert d["nn_gather"].shape == (2, 14, 48)


class TestMixedMCS:
    def test_var_mcs_model_runs(self):
        # build a 2-MCS variant of the small config
        import re
        src = open(os.path.join(TEST_CFG_DIR, "test_small.cfg")).read()
        src = re.sub(r"mcs_index = \[14\]", "mcs_index = [9, 14]", src)
        src = src.replace("label = 'test_small'",
                          "label = 'test_small_varmcs'")
        path = os.path.join(TEST_CFG_DIR, "test_small_varmcs.cfg")
        with open(path, "w") as f:
            f.write(src)
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.mixed_mcs import MixedMCSE2EModel
        p = Parameters("test_small_varmcs", system="nrx", training=False,
                       config_dir=TEST_CFG_DIR)
        p.nrx_dtype = jnp.float32
        m = MixedMCSE2EModel(p, mcs_arr_eval_idx=[0, 1], ue_return=0)
        params = m.init_params(jax.random.PRNGKey(0))
        b, b_hat, crc = jax.jit(
            lambda pr, k: m(pr, k, 2, jnp.float32(20.0)))(
                params, jax.random.PRNGKey(1))
        # UE 0 scheduled with MCS idx 0 (QPSK)
        assert b.shape[-1] == p.transmitters[0].tb_size
        assert b.shape == b_hat.shape
