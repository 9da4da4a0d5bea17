"""Reference weight importer tests (compat/reference_weights.py):
structural mapping of the 43-array nrx_rt pickle onto the CGNN pytree."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                   cgnn_apply, count_params)
from neural_rx_tpu.compat.reference_weights import import_reference_weights

REF_WEIGHTS = "/root/reference/weights/nrx_rt_weights"


def nrx_rt_cfg():
    return CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=2,
                      d_s=56, num_units_init=(128, 128),
                      num_units_agg=((64,), (64,)),
                      num_units_state=((128, 128), (128, 128)),
                      num_units_readout=(128,), initial_chest=True)


def synthetic_weight_list(cfg):
    """Build a random Keras-ordered weight list for the architecture."""
    rng = np.random.default_rng(0)
    out = []

    def sep(cin, cout):
        out.append(rng.normal(size=(3, 3, cin, 1)).astype(np.float32))
        out.append(rng.normal(size=(1, 1, cin, cout)).astype(np.float32))
        out.append(rng.normal(size=(cout,)).astype(np.float32))

    def dense(din, dout):
        out.append(rng.normal(size=(din, dout)).astype(np.float32))
        out.append(rng.normal(size=(dout,)).astype(np.float32))

    sep(18, 128); sep(128, 128); sep(128, 56)
    for _ in range(2):
        dense(56, 64); dense(64, 56)
        sep(114, 128); sep(128, 128); sep(128, 56)
    dense(56, 128); dense(128, 4)
    dense(56, 128); dense(128, 8)
    return out


class TestImporter:
    def test_synthetic_roundtrip_structure(self):
        cfg = nrx_rt_cfg()
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        wl = synthetic_weight_list(cfg)
        imported = import_reference_weights(params, wl)
        assert count_params(imported) == count_params(params) == 142922
        # depthwise layout translation: [3,3,C,1] -> [3,3,1,C] + HW swap
        np.testing.assert_allclose(
            np.asarray(imported["s_init"][0]["hidden"][0]["dw"]),
            np.transpose(wl[0], (1, 0, 3, 2)))
        np.testing.assert_allclose(
            np.asarray(imported["s_init"][0]["hidden"][0]["pw"]),
            wl[1][0, 0])
        np.testing.assert_allclose(
            np.asarray(imported["readout_chest"]["out"]["b"]), wl[42])

    def test_wrong_length_rejected(self):
        cfg = nrx_rt_cfg()
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        wl = synthetic_weight_list(cfg)[:-1]
        with pytest.raises((AssertionError, IndexError)):
            import_reference_weights(params, wl)

    @pytest.mark.skipif(not os.path.exists(REF_WEIGHTS),
                        reason="reference weights not mounted")
    def test_real_nrx_rt_pickle_imports_and_runs(self):
        cfg = nrx_rt_cfg()
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        with open(REF_WEIGHTS, "rb") as f:
            wl = pickle.load(f)
        imported = import_reference_weights(params, wl)
        y = jax.random.normal(jax.random.PRNGKey(1), (1, 14, 48, 8))
        pe = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 48, 2))
        h = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 14, 48, 8))
        llrs, h_hats = cgnn_apply(imported, cfg, y, pe, h,
                                  jnp.ones((1, 2)), jnp.ones((1, 2, 1)))
        out = np.asarray(llrs[-1][0])
        assert np.isfinite(out).all()
        # trained weights should produce confident (non-tiny) LLRs
        assert np.abs(out).mean() > 0.5


def test_e2e_constellation_roundtrip(tmp_path):
    """e2e configs: trainable constellation leads the reference list
    (Keras creation order); export -> import is exact."""
    import jax
    import numpy as np
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.compat.reference_weights import (
        save_reference_weights, load_reference_weights)

    p = Parameters("e2e_rt", system="nrx", training=True)
    m = E2EModel(p, training=True)
    params = m.init_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "e2e_rt_weights")
    save_reference_weights(path, params)
    back = load_reference_weights(path, params)
    assert set(back) == {"cgnn", "constellation"}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
