"""Mixed-MCS BLER evaluation (reference variable_mcs_nrx.ipynb cells
22-27): same-MCS and mixed-MCS TBLER of UE 0 under a 2-UE DoubleTDL mix,
Var-MCS NRX vs the LS/lin+LMMSE baseline.

Writes results/mixed_mcs_results.pkl in the reference's exact format:
  pickle.dump([ebno_db, BLERs_same_mcs, BLERs_mixed_mcs])
with keys (system_name, mcs_arr_idx):
  same[., 0]  = both UEs QPSK       (mask [[1,0],[1,0]])
  same[., 1]  = both UEs 16QAM      (mask [[0,1],[0,1]])
  mixed[., 0] = UE0 QPSK, UE1 16QAM (mask [[1,0],[0,1]])
  mixed[., 1] = UE0 16QAM, UE1 QPSK (mask [[0,1],[1,0]])

Usage: python scripts/eval_mixed_mcs.py [--config nrx_rt_var_mcs]
    [--ref-weights /root/reference/weights/nrx_rt_var_mcs_weights]
    [--snr -3 .. 7] [--target-errors 200] [--cpu]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt_var_mcs")
    ap.add_argument("--snr", type=float, nargs="*",
                    default=list(range(-3, 8)))
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--target-errors", type=int, default=200)
    ap.add_argument("--target-bler", type=float, default=1e-3)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--ref-weights", default=None)
    ap.add_argument("--out", default="results/mixed_mcs_results.pkl")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--systems", nargs="*", default=["nrx", "lslin"])
    ap.add_argument("--budget-s", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.mixed_mcs import (MixedMCSE2EModel,
                                             MixedMCSBaselineModel)
    from neural_rx_tpu.sim.simber import sim_ber
    from neural_rx_tpu.sim.training import load_weights

    ebno = np.asarray(args.snr, np.float64)
    # (scenario key, mcs order, one-hot rows per UE)
    cases = {
        "same": {0: ([0, 1], [[1, 0], [1, 0]]),
                 1: ([1, 0], [[0, 1], [0, 1]])},
        "mixed": {0: ([0, 1], [[1, 0], [0, 1]]),
                  1: ([1, 0], [[0, 1], [1, 0]])},
    }
    if os.path.exists(args.out):
        with open(args.out, "rb") as f:
            stored = pickle.load(f)
        assert np.allclose(stored[0], ebno), \
            "existing pickle has a different SNR grid"
        same, mixed = stored[1], stored[2]
    else:
        same, mixed = {}, {}
    t0 = time.time()

    for scen, entries in cases.items():
        store = same if scen == "same" else mixed
        for mcs_idx, (order, mask_rows) in entries.items():
            mask = jnp.asarray([mask_rows], jnp.float32)
            for system in args.systems:
                name = ("Neural Receiver" if system == "nrx"
                        else "Baseline - LS/lin+LMMSE")
                cur = store.get((name, mcs_idx))
                if cur is not None:
                    cur = np.asarray(cur, np.float64)
                    meas = np.isfinite(cur)
                    if meas.all() or (meas.any() and
                                      np.nanmin(cur) <= args.target_bler):
                        print(f"skip {scen} {name} mcs{mcs_idx} "
                              f"(stored)", flush=True)
                        continue
                if args.budget_s and time.time() - t0 > args.budget_s:
                    print("budget exhausted", flush=True)
                    return
                p = Parameters(args.config, system="nrx",
                               training=False, num_tx_eval=2)
                if system == "nrx":
                    model = MixedMCSE2EModel(p, order, ue_return=0,
                                             mcs_ue_mask=mask)
                    if args.ref_weights:
                        from neural_rx_tpu.compat.reference_weights \
                            import load_reference_weights
                        params = load_reference_weights(
                            args.ref_weights,
                            model.init_params(jax.random.PRNGKey(0)))
                    else:
                        wpath = args.weights or os.path.join(
                            "weights", f"{p.label}_weights.pkl")
                        params = load_weights(wpath)
                    num_it = p.num_nrx_iter_eval
                else:
                    model = MixedMCSBaselineModel(p, order, ue_return=0,
                                                  mcs_ue_mask=mask)
                    params, num_it = {}, None
                batch = args.batch or p.batch_size_eval
                print(f"=== {scen} | {name} | mcs_idx={mcs_idx} | "
                      f"order={order}", flush=True)

                def save_point(e, b, bl, _store=store, _k=(name, mcs_idx)):
                    cur = np.asarray(_store.get(
                        _k, np.full(len(ebno), np.nan)), np.float64)
                    cur[int(np.argmin(np.abs(ebno - e)))] = bl
                    _store[_k] = cur
                    with open(args.out, "wb") as f:
                        pickle.dump([ebno, same, mixed], f)

                sim_ber(
                    model, params, ebno, batch_size=batch,
                    max_mc_iter=args.max_iter,
                    num_target_block_errors=args.target_errors,
                    target_bler=args.target_bler, num_it=num_it,
                    fast_ldpc=True, point_callback=save_point)
                print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
