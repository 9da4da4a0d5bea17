"""Worker for the 2-process distributed training test.

Joins jax.distributed on CPU (1 device per process), builds the global
("data","grid") mesh spanning both processes, and runs ONE jitted
training step of the full E2E model with the batch sharded over the
cross-process "data" axis — XLA inserts the gradient all-reduce over the
process boundary (the DCN path on a real pod). Writes a param checksum
and the loss; the test asserts both processes stay bit-identical.

Usage: run_multiproc_train.py <coordinator> <num_proc> <pid> <out_dir>
"""

import pathlib
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_proc, pid, out_dir = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]), sys.argv[4])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_proc, process_id=pid)

repo = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(repo))

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neural_rx_tpu.sim.config import Parameters  # noqa: E402
from neural_rx_tpu.sim.e2e import E2EModel  # noqa: E402
from neural_rx_tpu.dist.multihost import global_mesh  # noqa: E402

assert jax.process_count() == num_proc
assert len(jax.devices()) == num_proc  # 1 CPU device per process

mesh = global_mesh(grid_per_host=1)
assert dict(mesh.shape) == {"data": num_proc, "grid": 1}

p = Parameters("test_small", system="nrx", training=True,
               config_dir=str(repo / "tests" / "data"))
batch = 2 * num_proc
model = E2EModel(p, training=True, mesh=mesh)
params = model.init_params(jax.random.PRNGKey(0))
optimizer = optax.adam(1e-3)
opt_state = optimizer.init(params)


def train_step(params, opt_state, key):
    def loss_fn(params):
        ld, lc = model(params, key, batch, jnp.float32(4.0),
                       mcs_ue_mask=jnp.ones(
                           (batch, p.max_num_tx, len(p.mcs_index))))
        return ld + 0.01 * lc
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


with mesh:
    step = jax.jit(train_step)
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1))
    # param checksum must agree across processes after the reduced update
    leaves = jax.tree.leaves(params)
    checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                         for l in leaves))
    loss = float(loss)

out = pathlib.Path(out_dir) / f"proc{pid}.npz"
np.savez(out, checksum=checksum, loss=loss)
print(f"proc {pid}: loss={loss:.6f} checksum={checksum:.6f}", flush=True)
