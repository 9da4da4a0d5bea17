"""Every committed reference weight pickle imports into the matching
config's param tree (reference weights/: 16 files, utils.py:34-70
format). e2e files lead with the trainable constellation(s) — the
transmitters are created before the receiver (parameters.py:242-261)."""
import os

import jax
import pytest

REF_WEIGHTS = "/root/reference/weights"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_WEIGHTS), reason="reference tree not present")


def _labels():
    if not os.path.isdir(REF_WEIGHTS):
        return []
    return sorted(f[:-8] for f in os.listdir(REF_WEIGHTS)
                  if f.endswith("_weights"))


@pytest.mark.parametrize("label", _labels())
def test_reference_weights_import(label):
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.compat.reference_weights import (
        load_reference_weights)

    p = Parameters(label, system="nrx", training=True)
    m = E2EModel(p, training=True)
    params = m.init_params(jax.random.PRNGKey(0))
    imported = load_reference_weights(
        os.path.join(REF_WEIGHTS, f"{label}_weights"), params)
    # same tree structure (constellation included for e2e configs)
    assert set(imported) == set(params)
    a = jax.tree.structure(imported["cgnn"])
    b = jax.tree.structure(params["cgnn"])
    assert a == b
