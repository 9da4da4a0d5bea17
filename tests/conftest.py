"""Test config: run on CPU with a virtual 8-device mesh for sharding tests.

The interpreter pre-imports jax at startup (site customization), so env
vars alone are too late; `jax.config.update` still works because no
backend has been initialized yet. Tests force the CPU backend so the suite
is hermetic and fast and the 8-device virtual mesh is available for
shard_map equivalence tests. TPU execution is covered by bench.py and
__graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
