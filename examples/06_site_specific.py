"""Site-specific fine-tuning: trajectory sampling, CIR dataset
generation (synthetic stand-in for the reference's Sionna-RT Munich
scene), Dataset-channel training and evaluation
(mirror of the reference site_specific notebook)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

SMOKE = "--smoke" in sys.argv

from neural_rx_tpu.sim.trajectory import (sample_along_trajectory,
                                          ensure_site_datasets)
from neural_rx_tpu.channel.dataset import DatasetChannel

os.makedirs("data", exist_ok=True)

# 1. trajectory through the site (reference: waypoints in Munich scene)
waypoints = [[0, 0, 1.5], [80, 0, 1.5], [80, 60, 1.5], [0, 60, 1.5]]
pos, vel = sample_along_trajectory(waypoints, 200, speed_mps=1.4)
print(f"trajectory: {len(pos)} positions over "
      f"{np.linalg.norm(np.diff(np.asarray(waypoints), axis=0), axis=1).sum():.0f} m")

# 2. CIR dataset (ray tracing is external in the reference as well;
#    synthetic geometry-consistent CIRs keep the pipeline runnable)
path, eval_path = ensure_site_datasets()
print(f"datasets written: {path}, {eval_path}")

# 3. Dataset channel draws (training partitions / eval pairing)
ch = DatasetChannel(path, training=True, num_tx=2)
h = ch(jax.random.PRNGKey(0), 4, 2, 14, 48, 30e3)
print(f"dataset channel CFRs: {h.shape}, "
      f"mean power {float(jnp.mean(jnp.abs(h)**2)):.3f}")
print("fine-tune with: python -m neural_rx_tpu.cli.train "
      "--config nrx_site_specific --warm-start "
      "(warm start from UMi-trained weights, reference workflow)")

if SMOKE:
    # golden outputs (examples/expected_outputs.md)
    assert len(pos) == 200 and len(vel) == 200
    assert np.allclose(np.linalg.norm(np.asarray(vel), axis=1), 1.4)
    assert h.shape == (4, 4, 2, 2, 14, 48)  # [b, rx, tx, ports, sym, sc]
    pw = float(jnp.mean(jnp.abs(h) ** 2))
    assert 0.05 < pw < 20.0, pw  # physically sane CFR power
    # training partitions are disjoint per UE (no shared CIR records)
    parts = ch.partitions
    assert len(np.intersect1d(parts[0], parts[1])) == 0
    print("SMOKE PASSED")
