"""Var-MCS training-path tests: masking mode (shared IO head) and
MCS-specific-IO mode both produce finite multi-MCS losses and gradients
for every head (reference var-MCS training, utils.py:259-311 +
neural_rx.py:565-590)."""

import os
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


def make_cfg(name, masking: bool):
    src = open(os.path.join(TEST_CFG_DIR, "test_small.cfg")).read()
    src = re.sub(r"mcs_index = \[14\]", "mcs_index = [9, 14, 19]", src)
    if masking:
        src = src.replace("[neural_receiver]",
                          "[neural_receiver]\nmcs_var_mcs_masking = True")
    src = src.replace("label = 'test_small'", f"label = '{name}'")
    path = os.path.join(TEST_CFG_DIR, f"{name}.cfg")
    with open(path, "w") as f:
        f.write(src)
    return name


@pytest.mark.slow
@pytest.mark.parametrize("masking", [False, True])
def test_multi_mcs_training_loss_and_grads(masking):
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.channel.double_tdl import DoubleTDLChannel
    name = make_cfg(f"test_varmcs_{'mask' if masking else 'io'}", masking)
    p = Parameters(name, system="nrx", training=True,
                   config_dir=TEST_CFG_DIR)
    assert p.mcs_var_mcs_masking == masking
    p.channel_model = DoubleTDLChannel(p.carrier.carrier_frequency,
                                       num_rx_ant=4, num_tx_ant=2)
    p.channel_type_name = "DoubleTDLlow"
    m = E2EModel(p, training=True)
    params = m.init_params(jax.random.PRNGKey(0))
    n_heads = len(params["cgnn"]["readout_llrs"])
    assert n_heads == (1 if masking else 3)

    def loss(params, key):
        # mixed assignment: UE0 -> MCS0, UE1 -> MCS2
        mm = jnp.tile(jax.nn.one_hot(jnp.asarray([0, 2]), 3)[None],
                      (2, 1, 1))
        ld, lc = m(params, key, 2, jnp.float32(6.0),
                   active_dmrs=jnp.ones((2, 2)), mcs_ue_mask=mm)
        return ld + 0.01 * lc

    val, g = jax.jit(jax.value_and_grad(loss))(params,
                                               jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    # every LLR head receives gradient (masking: the shared one;
    # IO mode: heads 0 and 2 scheduled, head 1 idle)
    gl = g["cgnn"]["readout_llrs"]
    def gnorm(tree):
        return sum(float(jnp.sum(jnp.abs(x)))
                   for x in jax.tree.leaves(tree))
    if masking:
        assert gnorm(gl[0]) > 0
    else:
        assert gnorm(gl[0]) > 0 and gnorm(gl[2]) > 0
        assert gnorm(gl[1]) == 0  # unscheduled MCS head gets no grad
