"""Variable-MCS operation: one network serving multiple MCS without
retraining — the two modes (MCS-specific IO layers vs shared masking)
and mixed-MCS evaluation (mirror of the reference var-MCS notebook)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from neural_rx_tpu.rx.cgnn import (CGNNConfig, init_cgnn_params,
                                   count_params)

SMOKE = "--smoke" in sys.argv

base = dict(num_rx_ant=4, num_it=2, d_s=56, num_units_init=(128, 128),
            num_units_agg=((64,), (64,)),
            num_units_state=((128, 128), (128, 128)),
            num_units_readout=(128,))
io_mode = CGNNConfig(num_bits_per_symbol=(2, 4, 6),
                     var_mcs_masking=False, **base)
mask_mode = CGNNConfig(num_bits_per_symbol=(2, 4, 6),
                       var_mcs_masking=True, **base)
p_io = init_cgnn_params(jax.random.PRNGKey(0), io_mode)
p_mask = init_cgnn_params(jax.random.PRNGKey(0), mask_mode)
print(f"MCS-specific IO  (QPSK/16QAM/64QAM): {count_params(p_io):,} "
      f"params ({len(p_io['s_init'])} input + "
      f"{len(p_io['readout_llrs'])} readout heads)")
print(f"var-MCS masking  (shared IO)       : {count_params(p_mask):,} "
      f"params (shared head truncated per MCS)")

# mixed-MCS evaluation: different UEs on different MCS simultaneously
from neural_rx_tpu.sim.config import Parameters
from neural_rx_tpu.sim.mixed_mcs import MixedMCSE2EModel
import re, tempfile
src = open(os.path.join(os.path.dirname(__file__), "..",
                        "neural_rx_tpu/configs/nrx_rt_var_mcs.cfg")).read()
with tempfile.TemporaryDirectory() as td:
    with open(os.path.join(td, "demo.cfg"), "w") as f:
        f.write(src.replace("label = 'nrx_rt_var_mcs'",
                            "label = 'demo'"))
    p = Parameters("demo", system="nrx", training=True, config_dir=td)
    p.nrx_dtype = jnp.float32
    m = MixedMCSE2EModel(p, mcs_arr_eval_idx=[0, 1], ue_return=0)
    params = m.init_params(jax.random.PRNGKey(0))
    b, b_hat, crc = jax.jit(lambda pr, k: m(
        pr, k, 2, jnp.float32(10.0)))(params, jax.random.PRNGKey(1))
    print(f"mixed-MCS eval: UE0 on QPSK (TB {b.shape[-1]} bits), "
          f"UE1 on 16QAM — ran OK")

if SMOKE:
    # golden outputs (examples/expected_outputs.md): exact parameter
    # counts of both var-MCS modes (the masking mode shares one head
    # where the IO mode carries 3 input + 3 readout stacks) and a
    # well-formed mixed-MCS eval
    assert count_params(p_io) == 215814, count_params(p_io)
    assert count_params(p_mask) == 143180, count_params(p_mask)
    assert len(p_io["s_init"]) == 3 and len(p_io["readout_llrs"]) == 3
    assert len(p_mask["s_init"]) == 1 and len(p_mask["readout_llrs"]) == 1
    assert b.shape == b_hat.shape and b.shape[-1] > 0
    import numpy as np
    assert set(np.unique(np.asarray(b_hat))) <= {0.0, 1.0}
    print("SMOKE PASSED")
