"""Quick BLER eval of THIS framework's trained nrx_rt weights at a few
Eb/No points (reference committed curve: 0.325 @ 2 dB, 0.0936 @ 3 dB,
0.016 @ 4 dB, 1.4e-3 @ 5 dB; DoubleTDLlow, 2 UE, MCS 14, 132 PRB).

Bounded Monte-Carlo (small targets) so it fits an end-of-round window;
appends a JSON record per run to results/trained_progress.jsonl keyed by
the checkpoint step, so successive training segments build a history.

Usage: python scripts/eval_trained_quick.py [--snr 3 4] [--max-iter 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Reference committed BLER curves keyed by (config, num_tx[, mcs head])
# — transcribed from the reference's results pickles (BASELINE.md §BLER;
# reference scripts/evaluate.py writes them). Used for the comparison
# column only.
REFERENCE_BLER_TABLE = {
    ("nrx_rt", 2): {2.0: 0.325, 3.0: 0.0936, 4.0: 0.016, 5.0: 1.4e-3},
    ("nrx_rt", 1): {1.0: 0.203, 2.0: 0.0338, 3.0: 2.53e-3},
    ("nrx_large", 2): {0.0: 0.761, 1.0: 0.443, 2.0: 0.150,
                       3.0: 0.0327, 4.0: 3.34e-3, 5.0: 1.77e-4},
    ("nrx_large", 1): {0.0: 0.476, 1.0: 0.146, 2.0: 0.0205,
                       3.0: 1.53e-3},
    ("nrx_rt_qpsk", 1): {-1.0: 0.305, 0.0: 0.0732, 1.0: 7.0e-3},
    ("nrx_rt_qpsk", 2): {0.0: 0.233, 1.0: 0.0487, 2.0: 4.73e-3},
    ("e2e_rt", 1): {1.0: 0.327, 2.0: 0.0731, 3.0: 7.8e-3, 4.0: 4e-4},
    ("nrx_rt_var_mcs", 2, 0): {0.0: 0.187, 1.0: 0.0301, 2.0: 3.17e-3},
    ("nrx_rt_var_mcs", 2, 1): {1.0: 0.573, 2.0: 0.232, 3.0: 0.0623,
                               4.0: 8.3e-3},
    ("nrx_site_specific_100k", 1): {1.0: 0.170, 5.0: 0.0519,
                                    14.0: 2e-4},
}


def reference_curve(config: str, num_tx: int, mcs: int):
    """Committed curve for the exact config (else its longest-prefix
    family match, announced on stdout so the comparison column is
    never silently mislabelled)."""
    for key in ((config, num_tx, mcs), (config, num_tx)):
        if key in REFERENCE_BLER_TABLE:
            return REFERENCE_BLER_TABLE[key]
    fam = sorted((k for k in REFERENCE_BLER_TABLE
                  if config.startswith(str(k[0])) and k[1] == num_tx),
                 key=lambda k: -len(str(k[0])))
    if not fam:
        return {}
    print(f"[eval] no committed reference curve for {config!r}; "
          f"comparison column uses family fallback {fam[0]}")
    return REFERENCE_BLER_TABLE[fam[0]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, nargs="*", default=[3.0, 4.0])
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--max-iter", type=int, default=10)
    ap.add_argument("--target-errors", type=int, default=60)  # parity anchors: pass 200
    ap.add_argument("--weights", default=None,
                    help="defaults to weights/{config}_weights.pkl")
    ap.add_argument("--ref-weights", default=None,
                    help="import a reference get_weights() pickle "
                         "(e.g. /root/reference/weights/nrx_large_weights) "
                         "instead of --weights")
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--num-tx", type=int, default=None)
    ap.add_argument("--mcs", type=int, default=0,
                    help="mcs_arr_eval_idx (var-MCS configs: which head)")
    ap.add_argument("--channel", default=None,
                    help="override eval channel_type (e.g. TDL-B100 for "
                         "the reference's 1-UE slices; DoubleTDL* needs "
                         "2 UEs)")
    ap.add_argument("--fast-ldpc", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pickle

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.simber import sim_ber
    from neural_rx_tpu.sim.training import load_weights

    default_weights = args.weights is None
    if default_weights:
        args.weights = f"weights/{args.config}_weights.pkl"
    step = None
    ckpt = f"weights/{args.config}_ckpt.pkl"

    kw = {}
    if args.num_tx is not None:
        kw["num_tx_eval"] = args.num_tx
    if args.channel is not None:
        kw["overrides"] = {"channel_type": args.channel}
    p = Parameters(args.config, system="nrx", training=False, **kw)
    p.nrx_dtype = jnp.float32
    model = E2EModel(p, training=False)
    if args.ref_weights:
        from neural_rx_tpu.compat.reference_weights import (
            load_reference_weights)
        params = model.init_params(jax.random.PRNGKey(0))
        params = load_reference_weights(args.ref_weights, params)
        args.weights = args.ref_weights
        step = "reference"
        print(f"imported reference weights {args.ref_weights}", flush=True)
    elif default_weights and not os.path.exists(args.weights) \
            and os.path.exists(ckpt):
        # segment was killed before its end-of-segment weight save
        # (watchdog / wall clock): evaluate the checkpoint params
        from neural_rx_tpu.sim.training import load_checkpoint
        params, _, step = load_checkpoint(ckpt)
        print(f"weights file missing; using checkpoint at step {step}",
              flush=True)
    else:
        params = load_weights(args.weights)
        if default_weights and os.path.exists(ckpt):
            # step only describes the default lineage; --weights/--ref-
            # weights point at other lineages (EMA, anneal branches)
            with open(ckpt, "rb") as f:
                step = pickle.load(f).get("step")
        print(f"loaded {args.weights} (ckpt step {step})", flush=True)

    t0 = time.time()
    ber, bler, berr, btot = sim_ber(
        model, params, args.snr, batch_size=args.batch,
        max_mc_iter=args.max_iter,
        num_target_block_errors=args.target_errors,
        mcs_arr_eval_idx=args.mcs,
        num_it=p.num_nrx_iter_eval, fast_ldpc=args.fast_ldpc,
        return_counts=True)
    from neural_rx_tpu.sim.simber import bler_confidence_interval
    ref_curve = reference_curve(args.config, p.max_num_tx, args.mcs)
    print("\nEb/No |   ours   [95% CI] (blocks) | reference (10M iters)")
    for e, b, be_, bt in zip(args.snr, bler, berr, btot):
        ref = ref_curve.get(float(e))
        lo, hi = bler_confidence_interval(int(be_), int(bt))
        print(f"{e:5.1f} | {float(b):8.4f} [{lo:.4f},{hi:.4f}] "
              f"({int(be_)}/{int(bt)}) | "
              f"{ref if ref is not None else '-'}")

    # goodput (info bits per RE; reference utils.py:430-486) — for
    # pilotless e2e configs the DMRS REs don't count against the RE
    # budget, which is the pilotless headline gain
    from neural_rx_tpu.sim.metrics import calculate_goodput
    rg = p.transmitters[args.mcs].resource_grid
    tbs = p.transmitters[args.mcs].tb_size
    gp = calculate_goodput(
        [float(b) for b in bler], tbs, rg.num_resource_elements,
        num_pilots=rg.num_pilot_symbols,
        include_pilots=not p.mask_pilots)

    os.makedirs("results", exist_ok=True)
    with open("results/trained_progress.jsonl", "a") as f:
        f.write(json.dumps({
            "config": args.config, "step": step, "mcs": args.mcs,
            "weights": args.weights, "channel": p.channel_type_name,
            "num_tx": p.max_num_tx,
            "snr_db": [float(x) for x in args.snr],
            "bler": [float(x) for x in bler],
            "ber": [float(x) for x in ber],
            "block_errors": [int(x) for x in berr],
            "num_blocks": [int(x) for x in btot],
            "goodput_bits_per_re": [round(float(g), 4) for g in gp],
            "eval_s": round(time.time() - t0, 1)}) + "\n")
    print("appended to results/trained_progress.jsonl", flush=True)


if __name__ == "__main__":
    main()
