"""BLER evaluation CLI (reference scripts/evaluate.py).

Usage: python -m neural_rx_tpu.cli.evaluate --config nrx_rt
       [--system nrx|baseline_lslin_lmmse|baseline_lmmse_kbest|
        baseline_perf_csi_kbest|...]
       [--snr 4] [--max-iter 2] [--num-tx-eval 2] [--mcs-idx 0]
       [--untrained] [--cpu]

Sweeps Eb/No per the config's [evaluation] section unless --snr is
given; appends (ebno, BER, BLER) to results/{label}_results.pkl keyed
(system, num_tx, mcs_idx) like the reference.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--system", default="nrx")
    ap.add_argument("--snr", type=float, nargs="*", default=None)
    ap.add_argument("--max-iter", type=int, default=100,
                    help="max Monte-Carlo iterations per SNR point")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--num-tx-eval", type=int, default=None)
    ap.add_argument("--mcs-idx", type=int, default=0)
    ap.add_argument("--target-block-errors", type=int, default=200)
    ap.add_argument("--target-bler", type=float, default=None)
    ap.add_argument("--untrained", action="store_true",
                    help="evaluate with random init (plumbing checks)")
    ap.add_argument("--fast-ldpc", action="store_true",
                    help="pallas layered min-sum decoder (TPU fast path)")
    ap.add_argument("--weights-dir", default="weights")
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.simber import sim_ber, save_results
    from neural_rx_tpu.sim.training import load_weights

    p = Parameters(args.config, system=args.system, training=False,
                   num_tx_eval=args.num_tx_eval)

    if args.snr is not None:
        ebno_dbs = np.asarray(args.snr, np.float32)
    else:
        ebno_dbs = np.arange(p.snr_db_eval_min, p.snr_db_eval_max,
                             p.snr_db_eval_stepsize, dtype=np.float32)
    batch = args.batch_size or p.batch_size_eval

    if args.system == "nrx":
        model = E2EModel(p, training=False)
        wpath = os.path.join(args.weights_dir, f"{p.label}_weights.pkl")
        if args.untrained or not os.path.exists(wpath):
            if not args.untrained:
                print(f"WARNING: no weights at {wpath}; using random init")
            params = model.init_params(jax.random.PRNGKey(0))
        else:
            params = load_weights(wpath)
        sys_name = "Neural Receiver"
        num_it = p.num_nrx_iter_eval
    else:
        from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
        model = BaselineE2EModel(p, system=args.system)
        params = {}
        sys_name = args.system
        num_it = None

    ber, bler = sim_ber(
        model, params, ebno_dbs, batch_size=batch,
        max_mc_iter=args.max_iter,
        num_target_block_errors=args.target_block_errors,
        target_bler=args.target_bler, mcs_arr_eval_idx=args.mcs_idx,
        num_it=num_it, fast_ldpc=args.fast_ldpc)

    save_results(os.path.join(args.results_dir, f"{p.label}_results.pkl"),
                 p.label, sys_name, p.max_num_tx, args.mcs_idx,
                 ebno_dbs, ber, bler)
    print("saved results")


if __name__ == "__main__":
    main()
