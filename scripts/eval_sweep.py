"""Depth-sweep BLER evaluation (reference nrx_architecture.ipynb cell
32 / results/nrx_large_sweep_results): evaluate ONE trained model at
num_it = 1..max_num_nrx_iter and store per-depth curves, mirroring the
reference pickle format
    pickle.dump([ebno_db, BERs, BLERs, GPs])
keyed (system_name, num_tx, mcs_idx, num_it); GPs holds the scalar
goodput (info bits per RE) at the highest measured SNR, matching the
reference's committed sweep files (e.g. 2.283 bits/RE for
('Neural Receiver', 2, 0, 8)).

Usage: python scripts/eval_sweep.py --config nrx_large
    [--ref-weights /root/reference/weights/nrx_large_weights]
    [--num-it 1 2 3 4 5 6 7 8] [--snr -2 .. 6] [--mcs-idx 0]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def save_sweep(path, name, num_tx, mcs_idx, num_it, ebno, ber, bler, gp):
    """Append-update the 4-element sweep pickle (one shared SNR grid —
    all sweeps here run the same --snr, so no union-merge needed; assert
    instead of silently misaligning)."""
    import numpy as np
    ebno = np.asarray(ebno, np.float64)
    if os.path.exists(path):
        with open(path, "rb") as f:
            e0, bers, blers, gps = pickle.load(f)
        assert np.allclose(np.asarray(e0, np.float64), ebno), \
            f"{path} holds a different SNR grid; use a fresh --out"
    else:
        e0, bers, blers, gps = ebno, {}, {}, {}
    key = (name, num_tx, mcs_idx, num_it)
    bers[key] = np.asarray(ber)
    blers[key] = np.asarray(bler)
    gps[key] = np.asarray(gp)
    with open(path, "wb") as f:
        pickle.dump([e0, bers, blers, gps], f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_large")
    ap.add_argument("--num-tx", type=int, default=2)
    ap.add_argument("--mcs-idx", type=int, nargs="*", default=[0])
    ap.add_argument("--num-it", type=int, nargs="*", default=None)
    ap.add_argument("--snr", type=float, nargs="*",
                    default=list(range(-2, 7)))
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--target-errors", type=int, default=200)
    ap.add_argument("--target-bler", type=float, default=1e-4)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--ref-weights", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--budget-s", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.metrics import calculate_goodput
    from neural_rx_tpu.sim.simber import sim_ber
    from neural_rx_tpu.sim.training import load_weights

    p = Parameters(args.config, system="nrx", training=False,
                   num_tx_eval=args.num_tx)
    out = args.out or os.path.join(
        "results", f"{p.label}_sweep_results.pkl")
    depths = args.num_it or list(range(1, p.num_nrx_iter + 1))
    ebno = np.asarray(args.snr, np.float64)

    model = E2EModel(p, training=False)
    if args.ref_weights:
        from neural_rx_tpu.compat.reference_weights import (
            load_reference_weights)
        params = load_reference_weights(
            args.ref_weights, model.init_params(jax.random.PRNGKey(0)))
    else:
        wpath = args.weights or os.path.join(
            "weights", f"{p.label}_weights.pkl")
        params = load_weights(wpath)

    stored = {}
    if os.path.exists(out):
        with open(out, "rb") as f:
            stored = pickle.load(f)[2]

    t0 = time.time()
    for mcs_idx in args.mcs_idx:
        tb = model.transmitters[mcs_idx]
        for it in depths:
            key = ("Neural Receiver", args.num_tx, mcs_idx, it)
            cur = stored.get(key)
            if cur is not None:
                cur = np.asarray(cur, np.float64)
                meas = np.isfinite(cur)
                # complete = every point measured, or the early-stop
                # threshold was reached (partial curves from a killed
                # run re-measure)
                if meas.all() or (meas.any()
                                  and np.nanmin(cur) <= args.target_bler):
                    print(f"skip {key} (stored)", flush=True)
                    continue
            if args.budget_s and time.time() - t0 > args.budget_s:
                print("budget exhausted", flush=True)
                return
            print(f"=== num_it={it} mcs_idx={mcs_idx}", flush=True)
            part_b = np.full(len(ebno), np.nan)
            part_bl = np.full(len(ebno), np.nan)

            def save_point(e, b, bl, _key=key):
                i = int(np.argmin(np.abs(ebno - e)))
                part_b[i], part_bl[i] = b, bl
                save_sweep(out, _key[0], _key[1], _key[2], _key[3],
                           ebno, part_b, part_bl, np.nan)

            ber, bler = sim_ber(
                model, params, ebno, batch_size=p.batch_size_eval,
                max_mc_iter=args.max_iter,
                num_target_block_errors=args.target_errors,
                target_bler=args.target_bler, mcs_arr_eval_idx=mcs_idx,
                num_it=it, fast_ldpc=True, point_callback=save_point)
            rg = tb.resource_grid
            gp = calculate_goodput(
                np.asarray(bler)[-1:], tb.tb_size,
                int(rg.num_data_symbols))[0]
            save_sweep(out, "Neural Receiver", args.num_tx, mcs_idx,
                       it, ebno, ber, bler, gp)
            print(f"appended {key} -> {out}", flush=True)


if __name__ == "__main__":
    main()
