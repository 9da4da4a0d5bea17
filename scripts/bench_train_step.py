"""On-chip A/B of the training step: grouped vs MXU-folded separable
convs (NRX_SEPCONV_FOLDED). Times the real make_chunk_step (100 fused
iterations per call) at the nrx_rt schedule operating point.

Usage: python scripts/bench_train_step.py [--folded] [--chunks 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--folded", action="store_true")
    # (--fused-train removed: the round-4 on-chip A/B measured the
    # custom-VJP pallas training stacks at 64.2 it/s vs 68.8 it/s for
    # the folded XLA convs; the kernel was deleted)
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.folded:
        os.environ["NRX_SEPCONV_FOLDED"] = "1"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import optax
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.training import make_chunk_step

    p = Parameters(args.config, system="nrx", training=True)
    model = E2EModel(p, training=True)
    params = model.init_params(jax.random.PRNGKey(42))
    sched = p.training_schedule
    optimizer = optax.adam(float(sched["learning_rate"][0]))
    opt_state = optimizer.init(params)

    step_fn = make_chunk_step(
        model, p, optimizer, list(range(len(p.mcs_index))),
        int(sched["batch_size"][0]),
        bool(sched["double_readout"][0]),
        float(sched["weighting_double_readout"][0]),
        bool(sched["apply_multiloss"][0]),
        bool(sched["train_tx"][0]), chunk=100)
    step_fn.set_snr_range(
        np.asarray(sched["min_training_snr_db"][0], np.float32),
        np.asarray(sched["max_training_snr_db"][0], np.float32))

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    key, sub = jax.random.split(key)
    params, opt_state, (ld, lc, loss) = step_fn(params, opt_state, sub)
    print(f"compile+first chunk: {time.time() - t0:.1f}s "
          f"(loss {float(loss):.4f})", flush=True)

    rates = []
    for _ in range(args.chunks):
        key, sub = jax.random.split(key)
        t0 = time.time()
        params, opt_state, (ld, lc, loss) = step_fn(params, opt_state,
                                                    sub)
        _ = float(loss)  # force completion through the tunnel
        rates.append(100.0 / (time.time() - t0))
    print(f"folded={args.folded}: {np.median(rates):.1f} it/s "
          f"(chunks: {[round(r, 1) for r in rates]})", flush=True)


if __name__ == "__main__":
    main()
