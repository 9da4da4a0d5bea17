"""Multi-host execution: initialization, per-host RNG, global meshes.

The reference is single-GPU (SURVEY.md §2.11); this module provides the
TPU-pod story: `jax.distributed` initialization, a global ("data",
"grid") mesh spanning hosts (data-parallel axis over DCN, grid axis over
ICI within each slice), and deterministic per-host PRNG folding so
Monte-Carlo channel realizations differ across hosts but are
reproducible.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(grid_per_host: int | None = None) -> Mesh:
    """Global ("data", "grid") mesh over all processes' devices.

    The "grid" axis (conv halo exchanges) stays within a host's local
    devices (ICI); hosts stack along "data" (gradient/counter psum over
    DCN).
    """
    devs = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    if grid_per_host is None:
        grid_per_host = n_local
    data = (n_hosts * n_local) // grid_per_host
    mesh_devs = devs.reshape(data, grid_per_host)
    return Mesh(mesh_devs, ("data", "grid"))


def host_fold_key(key: jax.Array) -> jax.Array:
    """Deterministic per-host PRNG stream (Monte-Carlo independence
    across hosts with reproducibility per host)."""
    return jax.random.fold_in(key, jax.process_index())
