"""Cross-config warm-start transfer (merge_matching_leaves).

The reference supports same-config warm start only
(train_neural_rx.py:96-101); this framework additionally transfers a
trained backbone across MCS configs, re-initializing only the leaves
whose path or shape differs (the per-MCS LLR readout heads).
"""
import jax
import numpy as np

from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.e2e import E2EModel
from neural_rx_tpu.sim.training import merge_matching_leaves


def _params(cfg):
    p = Parameters(cfg, system="nrx", training=True)
    return E2EModel(p, training=True).init_params(jax.random.PRNGKey(0))


def test_merge_identical_tree_copies_everything():
    src = _params("nrx_rt")
    dst = jax.tree.map(lambda x: np.zeros_like(x), src)
    merged, copied, kept = merge_matching_leaves(dst, src)
    assert kept == 0 and copied == len(jax.tree.leaves(src))
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(src)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cross_mcs_transfer_keeps_only_llr_head():
    src = _params("nrx_rt")        # MCS 14: 4-bit LLR head
    dst = _params("nrx_rt_qpsk")   # MCS 9: 2-bit LLR head
    merged, copied, kept = merge_matching_leaves(dst, src)
    # only the readout_llrs out layer (w, b) differs in shape
    assert kept == 2
    assert copied == len(jax.tree.leaves(src)) - 2
    # the backbone really took the source values
    flat_s = jax.tree_util.tree_flatten_with_path(src)[0]
    flat_m = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(merged)[0]}
    n_checked = 0
    for kp, v in flat_s:
        k = jax.tree_util.keystr(kp)
        if "readout_llrs" in k:
            continue
        np.testing.assert_array_equal(np.asarray(flat_m[k]), np.asarray(v))
        n_checked += 1
    assert n_checked > 30
    # the qpsk head keeps its own (2-wide) initialization
    assert np.shape(flat_m["['cgnn']['readout_llrs'][0]['out']['w']"])[-1] == 2
