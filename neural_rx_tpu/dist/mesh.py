"""Mesh + sharding helpers.

The canonical mesh has axes ("data", "grid"):
- "data": batch / Monte-Carlo axis — embarrassingly parallel, gradient
  psum over DCN between hosts (reference had only optional multi-GPU
  Monte-Carlo eval; SURVEY.md §2.11).
- "grid": the resource grid's subcarrier axis — the sequence-parallel
  analog. The CGNN is convolutional over (symbol, subcarrier); sharding
  subcarriers across chips makes the 3x3 convs exchange 1-RE halos with
  ring neighbors over ICI. We annotate shardings and let XLA's SPMD
  partitioner insert the halo exchanges (the "annotate, don't
  hand-schedule" recipe); per-RE MLPs, user aggregation, and readouts
  are shard-local.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              grid: int | None = None) -> Mesh:
    """Build a ("data", "grid") mesh over the first n_devices devices.

    Default factorization puts at most 2 ways on data and the rest on
    grid (batch-1 inference wants grid sharding; training wants data).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if data is None or grid is None:
        data = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
        grid = n_devices // data
    assert data * grid == n_devices
    arr = np.asarray(devs).reshape(data, grid)
    return Mesh(arr, ("data", "grid"))


def batch_grid_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                        sc_axis: int | None = None) -> NamedSharding:
    """NamedSharding: batch over "data", subcarrier axis over "grid"."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if sc_axis is not None:
        spec[sc_axis % ndim] = "grid"
    return NamedSharding(mesh, P(*spec))


def constrain(x, mesh: Mesh | None, batch_axis: int = 0,
              sc_axis: int | None = None):
    """with_sharding_constraint shortcut; no-op when mesh is None."""
    if mesh is None:
        return x
    s = batch_grid_sharding(mesh, x.ndim, batch_axis, sc_axis)
    return jax.lax.with_sharding_constraint(x, s)
