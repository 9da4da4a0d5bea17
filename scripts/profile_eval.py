"""Steady-state timing of Monte-Carlo eval steps on the real chip.

Measures compile time and per-step steady-state wall time for the
eval-step graphs the BLER sweeps are built from (reference analog:
`sim_ber` step cost, evaluate.py:193-357):

- nrx flooding LDPC vs nrx fast (pallas layered) LDPC
- LMMSE+K-Best / Perf-CSI+K-Best baselines

Usage: python scripts/profile_eval.py [--systems nrx nrx_fast kbest]
       [--batch 30] [--steps 3] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def time_steps(step, params, batch, ebno, n_steps):
    import jax
    key = jax.random.PRNGKey(0)
    import numpy as np

    def sync(o):
        # block_until_ready does not actually block through the axon
        # tunnel; force a device->host transfer to time real compute
        return [np.asarray(x) for x in o]

    t0 = time.time()
    out = sync(step(params, key, batch, ebno))
    compile_s = time.time() - t0
    times = []
    for i in range(n_steps):
        key = jax.random.fold_in(key, i)
        t0 = time.time()
        out = sync(step(params, key, batch, ebno))
        times.append(time.time() - t0)
    return compile_s, times, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--systems", nargs="*",
                    default=["nrx", "nrx_fast", "kbest", "perf_csi_kbest"])
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--kbest-batch", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--ebno", type=float, default=4.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
    from neural_rx_tpu.sim.simber import make_eval_step
    from neural_rx_tpu.sim.training import load_weights

    for system in args.systems:
        if system in ("nrx", "nrx_fast"):
            p = Parameters(args.config, system="nrx", training=False,
                           num_tx_eval=2)
            model = E2EModel(p, training=False)
            wpath = os.path.join("weights", f"{p.label}_weights.pkl")
            params = (load_weights(wpath) if os.path.exists(wpath)
                      else model.init_params(jax.random.PRNGKey(0)))
            step = make_eval_step(model, None, 0, p.num_nrx_iter_eval,
                                  fast_ldpc=(system == "nrx_fast"))
            batch = args.batch
        else:
            sysname = ("baseline_lmmse_kbest" if system == "kbest"
                       else f"baseline_{system}")
            p = Parameters(args.config, system=sysname, training=False,
                           num_tx_eval=2)
            model = BaselineE2EModel(p, sysname)
            params = {}
            step = make_eval_step(model, None, 0, None)
            batch = args.kbest_batch
        compile_s, times, out = time_steps(step, params, batch,
                                           np.float32(args.ebno),
                                           args.steps)
        bit_e, nbits, blk_e, nblk = [int(np.asarray(x)) for x in out]
        med = float(np.median(times))
        print(f"{system:18s} batch={batch:3d} compile={compile_s:7.1f}s "
              f"step_med={med:7.2f}s slots/s={batch / med:8.1f} "
              f"(last step BLER {blk_e}/{nblk})", flush=True)


if __name__ == "__main__":
    main()
