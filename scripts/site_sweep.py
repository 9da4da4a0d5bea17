"""Reduced site-specific fine-tune sweep (reference
results/nrx_site_specific_sweep_results, produced by the site-specific
notebook's fine-tuning loop: warm start from the UMi-trained backbone,
fine-tune N iterations on a CIR dataset of a given size, evaluate on the
held-out site eval trajectory; keys (name, num_tx, iters, dataset_size),
reference SURVEY.md §3.4).

Honest reduced subset (documented in results/README.md): this repo's
own synthetic-geometry CIR dataset (the reference's Munich ray trace is
not on disk), the 'Neural Receiver' family only, a 6-cell
(iters x dataset_size) grid including the (0, 0) no-fine-tune baseline.
Absolute BLERs are not comparable to the reference's (different
ray-traced site); the claim is the fine-tuning-gain trend across cells.

Writes results/nrx_site_specific_sweep_results.pkl in eval_sweep's
4-part format [ebno, BERs, BLERs, GPs] keyed
('Neural Receiver', 2, iters, size).

Usage: python scripts/site_sweep.py [--budget-s 2400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from eval_sweep import save_sweep  # noqa: E402 (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_site_specific_100k")
    ap.add_argument("--backbone", default="weights/nrx_rt_weights.pkl")
    ap.add_argument("--cells", default="0:0,200:-1,1000:-1,10000:-1,"
                    "1000:1000,10000:1000",
                    help="comma list iters:size (size -1 = full dataset, "
                         "0:0 = no fine-tune baseline)")
    ap.add_argument("--snr", type=float, nargs="*",
                    default=[5, 7, 9, 11, 13, 15, 17])
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--target-errors", type=int, default=200)
    ap.add_argument("--target-bler", type=float, default=2e-3)
    ap.add_argument("--out",
                    default="results/nrx_site_specific_sweep_results.pkl")
    ap.add_argument("--budget-s", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import optax
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.simber import sim_ber
    from neural_rx_tpu.sim.training import (make_chunk_step, load_weights)

    t0 = time.time()
    cells = []
    for tok in args.cells.split(","):
        it, size = tok.split(":")
        cells.append((int(it), int(size)))

    # eval model/dataset is shared by every cell -> one eval compile
    p_eval = Parameters(args.config, system="nrx", training=False,
                        num_tx_eval=2)
    model_eval = E2EModel(p_eval, training=False)
    ebno = np.asarray(args.snr, np.float64)
    full_n = None

    backbone = load_weights(args.backbone)

    import pickle
    done = {}
    if os.path.exists(args.out):
        with open(args.out, "rb") as f:
            stored = pickle.load(f)
        done = {k for k, v in stored[2].items()
                if np.isfinite(np.asarray(v, np.float64)).all()}

    # one training setup per dataset size (chunk recompiles when the
    # captured CIR constant changes)
    chunk_cache = {}

    def get_trainer(size):
        if size in chunk_cache:
            return chunk_cache[size]
        over = {} if size < 0 else {"cir_max_records": size}
        p_tr = Parameters(args.config, system="nrx", training=True,
                          overrides=over)
        model_tr = E2EModel(p_tr, training=True)
        sched = p_tr.training_schedule
        opt = optax.adam(float(sched["learning_rate"][0]))
        step = make_chunk_step(
            model_tr, p_tr, opt, [0],
            batch_size=int(sched["batch_size"][0]),
            double_readout=bool(sched["double_readout"][0]),
            weighting=float(sched["weighting_double_readout"][0]),
            apply_multiloss=bool(sched["apply_multiloss"][0]),
            train_tx=bool(sched["train_tx"][0]), chunk=100)
        step.set_snr_range(np.asarray(sched["min_training_snr_db"][0]),
                           np.asarray(sched["max_training_snr_db"][0]))
        chunk_cache[size] = (step, opt)
        return chunk_cache[size]

    # store the REAL record count for full-dataset cells (the reference
    # sweep keys carry actual dataset sizes, not a -1 sentinel); the
    # TRAIN partition is what fine-tuning consumes
    from neural_rx_tpu.channel.dataset import load_cir_records
    import configparser
    cp = configparser.ConfigParser(inline_comment_prefixes=("#",))
    cp.read(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "neural_rx_tpu", "configs",
        args.config + ".cfg"))
    train_file = cp["training"]["tfrecord_filename"].strip().strip("'\"")
    full_n = load_cir_records(os.path.join("data", train_file))[0].shape[0]

    for iters, size in cells:
        key_size = full_n if (size < 0 and iters > 0) else max(size, 0)
        key = ("Neural Receiver", 2, iters, key_size)
        if key in done:
            print(f"skip {key} (stored)", flush=True)
            continue
        if args.budget_s and time.time() - t0 > args.budget_s:
            print("budget exhausted", flush=True)
            return
        params = jax.tree.map(jnp.asarray, backbone)
        if iters > 0:
            step, opt = get_trainer(size)
            opt_state = opt.init(params)
            k = jax.random.PRNGKey(1234 + iters + max(size, 0))
            t_tr = time.time()
            for c in range(max(1, iters // 100)):
                k, sub = jax.random.split(k)
                params, opt_state, (ld, lc, loss) = step(
                    params, opt_state, sub)
            print(f"cell {key}: fine-tuned {iters} iters "
                  f"(loss {float(loss):.4f}, {time.time()-t_tr:.0f}s)",
                  flush=True)

        bers = np.full(len(ebno), np.nan)
        blers = np.full(len(ebno), np.nan)

        def save_point(e, b, bl, _k=key, _bers=bers, _blers=blers):
            i = int(np.argmin(np.abs(ebno - e)))
            _bers[i], _blers[i] = b, bl
            save_sweep(args.out, _k[0], _k[1], _k[2], _k[3],
                       ebno, _bers, _blers,
                       np.zeros(len(ebno)))

        sim_ber(model_eval, params, ebno,
                batch_size=p_eval.batch_size_eval,
                max_mc_iter=args.max_iter,
                num_target_block_errors=args.target_errors,
                target_bler=args.target_bler, mcs_arr_eval_idx=0,
                num_it=p_eval.num_nrx_iter_eval, fast_ldpc=True,
                point_callback=save_point)
        print(f"cell {key}: eval done "
              f"({time.time()-t0:.0f}s elapsed)", flush=True)


if __name__ == "__main__":
    main()
