"""Trajectory sampling + synthetic CIR dataset generation for
site-specific training.

`sample_along_trajectory` reproduces the reference utility
(utils/utils.py:819-879): waypoints -> equally-spaced positions +
per-segment velocity vectors for dataset generation. Ray tracing itself
is external in the reference too (a notebook using Sionna RT); here
`generate_synthetic_cir_dataset` produces a geometry-consistent
synthetic CIR dataset (cluster scatterers around the trajectory) in the
.cirbin format so the full site-specific fine-tuning pipeline
(channel='Dataset') is exercisable end-to-end without a ray tracer.
"""

from __future__ import annotations

import numpy as np

from ..channel.io_native import write_cirbin

SPEED_OF_LIGHT = 299792458.0


def sample_along_trajectory(waypoints, num_points: int, speed_mps: float
                            = 1.0):
    """Waypoints [W, 3] -> (positions [N, 3], velocities [N, 3]).

    Points are equally spaced along the polyline; the velocity at each
    point is the segment direction scaled by `speed_mps`
    (reference utils.py:819-879 semantics).
    """
    wp = np.asarray(waypoints, np.float64)
    seg = np.diff(wp, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    s = np.linspace(0.0, total, num_points, endpoint=False)
    pos = np.empty((num_points, wp.shape[1]))
    vel = np.empty_like(pos)
    for i, si in enumerate(s):
        j = min(np.searchsorted(cum, si, "right") - 1, len(seg) - 1)
        frac = (si - cum[j]) / max(seg_len[j], 1e-12)
        pos[i] = wp[j] + frac * seg[j]
        vel[i] = seg[j] / max(seg_len[j], 1e-12) * speed_mps
    return pos, vel


def generate_synthetic_cir_dataset(
        path: str, waypoints, num_points: int, bs_position,
        carrier_frequency: float = 2.14e9, num_rx_ant: int = 4,
        num_tx_ant: int = 2, num_paths: int = 12, seed: int = 0):
    """Synthetic site dataset: scatterers near the trajectory produce
    per-position CIRs (a, tau) with geometry-consistent delays/phases.
    """
    rng = np.random.default_rng(seed)
    pos, _ = sample_along_trajectory(waypoints, num_points)
    bs = np.asarray(bs_position, np.float64)
    # static scatterer field around the site
    center = pos.mean(0)
    scat = center + rng.normal(scale=60.0, size=(num_paths - 1, 3))
    scat[:, 2] = np.abs(scat[:, 2]) + 5.0
    lam = SPEED_OF_LIGHT / carrier_frequency

    a = np.zeros((num_points, num_rx_ant, num_tx_ant, num_paths),
                 np.complex64)
    tau = np.zeros((num_points, num_paths), np.float32)
    for i, p in enumerate(pos):
        # direct path + scattered paths
        d_los = np.linalg.norm(bs - p)
        dists = [d_los] + [np.linalg.norm(p - s) + np.linalg.norm(bs - s)
                           for s in scat]
        dists = np.asarray(dists)
        tau[i] = (dists / SPEED_OF_LIGHT).astype(np.float32)
        gains = np.concatenate(
            [[1.0], 0.3 * rng.rayleigh(scale=1.0, size=num_paths - 1)])
        gains = gains / np.linalg.norm(gains)
        phases = np.exp(-2j * np.pi * dists / lam)
        # simple array response per path (angles from geometry):
        # direct path departs toward the BS / arrives from the UE;
        # scattered paths depart/arrive via their scatterer
        dep_targets = np.vstack([bs[None], scat])
        arr_targets = np.vstack([p[None], scat])
        aod = np.arctan2(dep_targets[:, 1] - p[1],
                         dep_targets[:, 0] - p[0] + 1e-9)
        aoa = np.arctan2(arr_targets[:, 1] - bs[1],
                         arr_targets[:, 0] - bs[0] + 1e-9)
        for pi in range(num_paths):
            ar = np.exp(1j * np.pi * np.arange(num_rx_ant)
                        * np.sin(aoa[pi]))
            at = np.exp(1j * np.pi * np.arange(num_tx_ant)
                        * np.sin(aod[pi]))
            a[i, :, :, pi] = (gains[pi] * phases[pi]
                              * np.outer(ar, at)).astype(np.complex64)
    write_cirbin(path, a, tau)
    return pos


# canonical synthetic site (stand-in for the reference's ray-traced
# Munich scene): train/eval trajectories through one scatterer field
SITE_BS_POSITION = [40.0, 30.0, 25.0]
SITE_TRAIN_WAYPOINTS = [[0, 0, 1.5], [80, 0, 1.5], [80, 60, 1.5],
                        [0, 60, 1.5]]
SITE_EVAL_WAYPOINTS = [[-80.0, 40.0, 1.5], [20.0, -30.0, 1.5],
                       [90.0, 60.0, 1.5]]


def ensure_site_datasets(data_dir: str = "data", num_points: int = 200):
    """Generate the site-specific train/eval .cirbin datasets if absent.

    data/ is a generated-locally directory (like the reference's,
    README.md:82-85); the site-specific configs and tests call this so
    a fresh clone is self-sufficient without a ray tracer.
    """
    import os
    os.makedirs(data_dir, exist_ok=True)
    train = os.path.join(data_dir, "nrx_site_specific_train.cirbin")
    if not os.path.exists(train):
        generate_synthetic_cir_dataset(
            train, SITE_TRAIN_WAYPOINTS, num_points,
            bs_position=SITE_BS_POSITION, seed=0)
    ev = os.path.join(data_dir, "nrx_site_specific_eval.cirbin")
    if not os.path.exists(ev):
        generate_synthetic_cir_dataset(
            ev, SITE_EVAL_WAYPOINTS, num_points,
            bs_position=SITE_BS_POSITION, seed=1)
    return train, ev
