"""Covariance matrix estimation CLI (reference scripts/compute_cov_mat.py
— implemented as a library call, no subprocess orchestration).

Usage: python -m neural_rx_tpu.cli.compute_cov --config nrx_rt
       [--batches 8] [--batch-size 16] [--cpu]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.covariance import compute_cov_matrices

    # covariances are measured on the TRAINING channel (UMi) at the
    # evaluation bandwidth, like the reference
    p = Parameters(args.config, system="nrx", training=False)
    p_train = Parameters(args.config, system="nrx", training=True)
    p.channel_model = p_train.channel_model
    p.channel_type_name = p_train.channel_type_name
    cf, ct, cs = compute_cov_matrices(p, num_batches=args.batches,
                                      batch_size=args.batch_size)
    os.makedirs(args.out_dir, exist_ok=True)
    for name, c in (("freq", cf), ("time", ct), ("space", cs)):
        path = os.path.join(args.out_dir,
                            f"{p.label}_{name}_cov_mat.npy")
        np.save(path, c)
        print(f"saved {path} {c.shape}")


if __name__ == "__main__":
    main()
