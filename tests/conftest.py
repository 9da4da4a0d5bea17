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


# Fast edit-loop tier: `pytest -m quick` (< ~2 min). Files chosen from
# the measured per-test durations of the full suite (round-4 run:
# 284 tests / ~28 min wall); everything not listed still runs in the
# default (unfiltered) invocation.
_QUICK_FILES = {
    "test_cgnn.py",
    "test_cgnn_iter_pallas.py",
    "test_dataset_channel.py",
    "test_nr_grid.py",
    "test_phy_primitives.py",
    "test_profiling.py",
    "test_results_format.py",
    "test_sepconv_pallas.py",
    "test_warm_start.py",
    "test_weight_import.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if os.path.basename(str(item.fspath)) in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
