"""Full BLER evaluation sweep (reference scripts/evaluate.py): loops
num_tx x MCS, evaluates the neural receiver and the classical baseline
systems, appends incrementally to results/{label}_results.pkl.

Usage: python scripts/evaluate_all.py --config nrx_rt
       [--num-tx 1 2] [--systems nrx baseline_lslin_lmmse ...]
       [--max-iter 30] [--fast-ldpc] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_SYSTEMS = ["nrx", "baseline_lslin_lmmse", "baseline_lsnn_lmmse",
                   "baseline_lmmse_kbest", "baseline_perf_csi_kbest"]
SYSTEM_LABELS = {
    "nrx": "Neural Receiver",
    "baseline_lslin_lmmse": "Baseline - LS/lin+LMMSE",
    "baseline_lsnn_lmmse": "Baseline - LS/nn+LMMSE",
    "baseline_lmmse_lmmse": "Baseline - LMMSE+LMMSE",
    "baseline_lmmse_kbest": "Baseline - LMMSE+K-Best",
    "baseline_perf_csi_kbest": "Baseline - Perf. CSI & K-Best",
    "baseline_perf_csi_lmmse": "Baseline - Perf. CSI & LMMSE",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--num-tx", type=int, nargs="*", default=None)
    ap.add_argument("--systems", nargs="*", default=DEFAULT_SYSTEMS)
    ap.add_argument("--mcs-idx", type=int, nargs="*", default=None)
    ap.add_argument("--max-iter", type=int, default=30)
    ap.add_argument("--target-block-errors", type=int, default=200)
    ap.add_argument("--target-bler", type=float, default=1e-4)
    ap.add_argument("--fast-ldpc", action="store_true")
    ap.add_argument("--snr", type=float, nargs="*", default=None,
                    help="explicit Eb/No points (default: the config's "
                         "eval range)")
    ap.add_argument("--budget-s", type=float, default=None,
                    help="soft wall-clock budget: no NEW (system, tx, "
                         "mcs) sweep starts after this many seconds")
    ap.add_argument("--bracket-bler", type=float, default=5e-3,
                    help="refuse to finish a curve whose deepest "
                         "measured BLER is above this: extend the sweep "
                         "past the config's SNR grid (config stepsize) "
                         "until it drops below, so the 1e-2 comparison "
                         "crossing is always bracketed (the round-4 nan "
                         "summary cells were curves that ran out of "
                         "grid above 1e-2). 0 disables")
    ap.add_argument("--extend-db", type=float, default=6.0,
                    help="max extra dB appended past the config grid "
                         "by --bracket-bler")
    ap.add_argument("--channel", default=None,
                    help="override the eval channel_type (reference "
                         "1-UE slices use TDL-B100 where the 2-UE "
                         "curves use DoubleTDL)")
    ap.add_argument("--untrained", action="store_true")
    ap.add_argument("--ref-weights", default=None,
                    help="import a REFERENCE Keras weight-list pickle "
                         "(compat.reference_weights layout translation) "
                         "for the nrx system, e.g. "
                         "/root/reference/weights/nrx_rt_weights")
    ap.add_argument("--weights", default=None,
                    help="explicit weights pickle for the nrx system "
                         "(e.g. an imported reference weight set from "
                         "compat.reference_weights) instead of "
                         "weights/{label}_weights.pkl")
    ap.add_argument("--results-name", default=None,
                    help="results pickle basename (default: "
                         "{label}_results). Use e.g. {label}_ref for "
                         "imported-reference-weight curves so own-"
                         "trained results are not mixed in")
    ap.add_argument("--weights-dir", default="weights")
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
    from neural_rx_tpu.sim.simber import sim_ber, save_results
    from neural_rx_tpu.sim.training import load_weights

    p0 = Parameters(args.config, system="dummy", training=False)
    num_txs = args.num_tx or list(range(1, len(p0.dmrs_port_sets) + 1))
    mcs_idxs = args.mcs_idx or list(range(len(p0.mcs_index)))
    if args.snr is not None:
        ebno_dbs = np.asarray(args.snr, dtype=np.float32)
    else:
        ebno_dbs = np.arange(p0.snr_db_eval_min, p0.snr_db_eval_max,
                             p0.snr_db_eval_stepsize, dtype=np.float32)
    res_name = args.results_name or f"{p0.label}_results"
    res_path = os.path.join(args.results_dir, f"{res_name}.pkl")

    import time
    t_start = time.time()
    for num_tx in num_txs:
        for mcs_idx in mcs_idxs:
            for system in args.systems:
                if (args.budget_s is not None
                        and time.time() - t_start > args.budget_s):
                    print(f"budget {args.budget_s}s exhausted; stopping "
                          f"before {system}/tx{num_tx}/mcs{mcs_idx}",
                          flush=True)
                    return
                print(f"=== {system} | num_tx={num_tx} | mcs_idx="
                      f"{mcs_idx}", flush=True)
                kw = {}
                if args.channel is not None:
                    kw["overrides"] = {"channel_type": args.channel}
                p = Parameters(args.config, system=system,
                               training=False, num_tx_eval=num_tx, **kw)
                if (p.channel_type_name.startswith("DoubleTDL")
                        and num_tx != 2):
                    print("skip: DoubleTDL needs exactly 2 UEs",
                          flush=True)
                    continue
                if system == "nrx":
                    model = E2EModel(p, training=False)
                    if args.ref_weights:
                        from neural_rx_tpu.compat.reference_weights \
                            import load_reference_weights
                        params = load_reference_weights(
                            args.ref_weights,
                            model.init_params(jax.random.PRNGKey(0)))
                    else:
                        wpath = args.weights or os.path.join(
                            args.weights_dir, f"{p.label}_weights.pkl")
                        if args.untrained:
                            params = model.init_params(
                                jax.random.PRNGKey(0))
                        elif not os.path.exists(wpath):
                            # NEVER silently evaluate a random init: a
                            # missing weights file once appended a
                            # BLER=1.0 curve to a committed results
                            # pickle (round-2 e2e_rt incident)
                            raise SystemExit(
                                f"no weights at {wpath}; pass --weights/"
                                f"--ref-weights or explicit --untrained")
                        else:
                            params = load_weights(wpath)
                    num_it = p.num_nrx_iter_eval
                    batch = p.batch_size_eval
                else:
                    model = BaselineE2EModel(p, system)
                    params = {}
                    num_it = None
                    batch = (p.batch_size_eval_small
                             if "kbest" in system else p.batch_size_eval)
                last = {}

                def save_point(e, b, bl, _tx=num_tx, _m=mcs_idx,
                               _sys=system, _last=last):
                    save_results(res_path, p.label, SYSTEM_LABELS[_sys],
                                 _tx, _m, np.asarray([e]),
                                 np.asarray([b]), np.asarray([bl]))
                    _last["ebno"], _last["bler"] = float(e), float(bl)

                ber, bler = sim_ber(
                    model, params, ebno_dbs, batch_size=batch,
                    max_mc_iter=args.max_iter,
                    num_target_block_errors=args.target_block_errors,
                    target_bler=args.target_bler, mcs_arr_eval_idx=mcs_idx,
                    num_it=num_it, fast_ldpc=args.fast_ldpc,
                    point_callback=save_point)
                # a curve must not end above the comparison target: keep
                # stepping past the config grid until the deepest point
                # is below --bracket-bler (so the 1e-2 crossing exists)
                step_db = float(p0.snr_db_eval_stepsize)
                e_max = float(ebno_dbs[-1]) + args.extend_db
                while (args.bracket_bler > 0 and last
                       and last["bler"] > args.bracket_bler
                       and last["ebno"] + step_db <= e_max + 1e-9
                       and (args.budget_s is None
                            or time.time() - t_start < args.budget_s)):
                    e_next = last["ebno"] + step_db
                    print(f"  extending past grid: {e_next:.2f} dB "
                          f"(deepest BLER {last['bler']:.3g})",
                          flush=True)
                    sim_ber(model, params, np.asarray([e_next],
                                                      np.float32),
                            batch_size=batch, max_mc_iter=args.max_iter,
                            num_target_block_errors=(
                                args.target_block_errors),
                            target_bler=args.target_bler,
                            mcs_arr_eval_idx=mcs_idx, num_it=num_it,
                            fast_ldpc=args.fast_ldpc,
                            point_callback=save_point)
                print(f"appended to {res_path}", flush=True)


if __name__ == "__main__":
    main()
