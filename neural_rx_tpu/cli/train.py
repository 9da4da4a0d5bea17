"""Training CLI (reference scripts/train_neural_rx.py).

Usage: python -m neural_rx_tpu.cli.train --config nrx_rt [--smoke]
       [--iters N] [--warm-start] [--cpu]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="config label, e.g. nrx_rt")
    ap.add_argument("--smoke", action="store_true",
                    help="few hundred iterations; assert loss decreases")
    ap.add_argument("--iters", type=int, default=None,
                    help="cap total SGD iterations")
    ap.add_argument("--warm-start", action="store_true",
                    help="resume from existing weights file")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--weights-dir", default="weights")
    ap.add_argument("--log-dir", default="logs")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.training import (training_loop, load_weights,
                                            load_checkpoint)

    overrides = None
    if args.smoke and args.cpu:
        # CPU smoke: XLA-CPU depthwise-conv backprop is slow, so keep
        # the work tiny; AWGN (instead of 38.901) converges fast enough
        # to assert on while exercising the full TX->RX->loss->grad path
        overrides = {"channel_type": "AWGN"}
    p = Parameters(args.config, system="nrx", training=True,
                   overrides=overrides)
    model = E2EModel(p, training=True)
    params = model.init_params(jax.random.PRNGKey(args.seed))

    wpath = os.path.join(args.weights_dir, f"{p.label}_weights.pkl")
    if args.warm_start and os.path.exists(wpath):
        print(f"warm start from {wpath}")
        params = load_weights(wpath)

    max_iters = args.iters
    chunk = 100
    if args.smoke:
        max_iters = max_iters or 500
        if args.cpu:
            # shrunk batch/chunk so the smoke finishes in minutes
            p.training_schedule["batch_size"] = [
                4 for _ in p.training_schedule["batch_size"]]
            chunk = 10
            max_iters = args.iters or 30

    import json
    # smoke runs write under an isolated label: a smoke must NEVER
    # clobber the real trained weights pickle or truncate the live
    # training log (this happened once — cost a trained-weights
    # restore from git)
    label = f"{p.label}_smoke" if args.smoke else p.label
    log_path = os.path.join(args.log_dir, f"{label}.jsonl")
    if args.smoke and os.path.exists(log_path):
        os.remove(log_path)

    params = training_loop(model, p, params, label=label,
                           results_dir=args.weights_dir,
                           log_dir=args.log_dir, seed=args.seed,
                           chunk=chunk, max_iters=max_iters)

    if args.smoke:
        recs = [json.loads(line) for line in open(log_path)]
        first, last = recs[0]["loss"], recs[-1]["loss"]
        print(f"smoke: loss {first:.4f} -> {last:.4f}")
        # decreasing, or already far below the ln(2)=0.693 random floor
        assert last < first or last < 0.6, \
            "smoke failed: loss did not decrease"
        print("SMOKE PASSED")


if __name__ == "__main__":
    main()
