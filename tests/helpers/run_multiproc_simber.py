"""Worker for the 2-process sim_ber test: initialize jax.distributed on
CPU, run sim_ber with the shared fake model, process 0 writes results.

Usage: python run_multiproc_simber.py <coordinator> <num_proc> <pid> <out>
Environment: CPU-hermetic (no axon registration), 1 CPU device/process.
"""

import pathlib
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_proc, pid, out = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_proc, process_id=pid)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from fake_eval_model import FakeEvalModel  # noqa: E402
from neural_rx_tpu.sim.simber import sim_ber  # noqa: E402

assert jax.process_count() == num_proc
bers, blers = sim_ber(FakeEvalModel(), None, [-3.0, 5.0], batch_size=8,
                      max_mc_iter=6, num_target_block_errors=40,
                      seed=7, verbose=False)
if jax.process_index() == 0:
    np.savez(out, bers=bers, blers=blers)
print(f"proc {pid} done", flush=True)
