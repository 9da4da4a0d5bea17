"""Config-matrix smoke: all 17 shipped configurations parse and
assemble in both training and eval modes, and their E2E models build.
Catches config typos and assembly regressions across the whole
experiment matrix (reference config/*.cfg parity)."""

import os

import numpy as np
import pytest

import neural_rx_tpu.sim.config as cfg_mod

ALL_CONFIGS = sorted(
    f[:-4] for f in os.listdir(cfg_mod.CONFIG_DIR) if f.endswith(".cfg"))

# site-specific configs need the synthetic CIR datasets (data/ is a
# generated-locally directory; this is cheap and deterministic)
from neural_rx_tpu.sim.trajectory import ensure_site_datasets  # noqa: E402

ensure_site_datasets()


def test_all_17_configs_present():
    assert len(ALL_CONFIGS) == 17
    for label in ("nrx_rt", "nrx_large", "e2e_rt",
                  "nrx_large_var_mcs_64qam_masking",
                  "nrx_site_specific"):
        assert label in ALL_CONFIGS


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_parses_dummy(name):
    p = cfg_mod.Parameters(name, system="dummy", training=False)
    assert p.label == name
    assert p.n_size_bwp in (4, 132)


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_training_assembly_builds(name):
    # site-specific configs load the committed data/*.cirbin datasets
    # (the cfg keeps the reference's .tfrecord names; the loader falls
    # back to the .cirbin artifact with the same basename)
    p = cfg_mod.Parameters(name, system="nrx", training=True)
    assert len(p.transmitters) == len(p.mcs_index)
    assert p.transmitters[0].resource_grid.num_subcarriers \
        == 12 * p.n_size_bwp
    # E2E model constructs (receiver, PE, estimators)
    from neural_rx_tpu.sim.e2e import E2EModel
    m = E2EModel(p, training=True)
    import jax
    params = m.init_params(jax.random.PRNGKey(0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n > 10000


@pytest.mark.parametrize("name", ["nrx_rt", "nrx_large_var_mcs",
                                  "e2e_rt", "e2e_baseline"])
def test_eval_assembly_builds(name):
    p = cfg_mod.Parameters(name, system="nrx", training=False)
    assert p.n_size_bwp == 132  # eval bandwidth override
    from neural_rx_tpu.sim.e2e import E2EModel
    E2EModel(p, training=False)


def test_expected_parameter_counts():
    """Architecture sizes for known configs (reference-published)."""
    import jax
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.rx.cgnn import count_params
    p = cfg_mod.Parameters("nrx_rt", system="nrx", training=True)
    m = E2EModel(p, training=True)
    params = m.init_params(jax.random.PRNGKey(0))
    assert count_params(params["cgnn"]) == 142922
    p8 = cfg_mod.Parameters("nrx_large", system="nrx", training=True)
    m8 = E2EModel(p8, training=True)
    params8 = m8.init_params(jax.random.PRNGKey(0))
    assert count_params(params8["cgnn"]) == 142922 + 6 * 49074

def test_site_specific_e2e_forward():
    """Full site-specific eval forward through the Dataset channel:
    paired-trajectory subsampling -> CFR projection -> NRX chain."""
    import jax
    from neural_rx_tpu.sim.e2e import E2EModel
    p = cfg_mod.Parameters("nrx_site_specific", system="nrx",
                           training=False)
    assert p.channel_type_name == "Dataset"
    m = E2EModel(p, training=False)
    params = m.init_params(jax.random.PRNGKey(0))
    out = m(params, jax.random.PRNGKey(1), 2, np.float32(10.0),
            num_it=p.num_nrx_iter_eval)
    b, b_hat = out[0], out[1]
    assert b.shape == b_hat.shape
    assert np.isfinite(np.asarray(b_hat)).all()
