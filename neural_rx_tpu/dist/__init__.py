"""Device-mesh construction and grid sharding (TPU-native scaling layer;
SURVEY.md §2.11: data parallel over batch, sequence-parallel analog over
the resource grid's subcarrier axis with conv halo exchange)."""

from .mesh import make_mesh, batch_grid_sharding, constrain
