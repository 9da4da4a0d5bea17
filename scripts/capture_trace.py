"""Capture a jax.profiler trace of the training chunk and/or the
deployed inference step on the current backend.

Usage: python scripts/capture_trace.py [--what train infer]
       [--config nrx_rt] [--out logs/traces] [--steps 3]

Writes a TensorBoard-loadable trace directory; inspect op-level device
time to target optimization (SURVEY.md §5: the reference delegated this
to trtexec/Nsight; here jax.profiler is first-class).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", nargs="*", default=["train", "infer"])
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--out", default="logs/traces")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)

    if "train" in args.what:
        import optax
        from neural_rx_tpu.sim.config import Parameters
        from neural_rx_tpu.sim.e2e import E2EModel
        from neural_rx_tpu.sim.training import make_chunk_step

        p = Parameters(args.config, system="nrx", training=True)
        model = E2EModel(p, training=True)
        params = model.init_params(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        sched = p.training_schedule
        step = make_chunk_step(
            model, p, opt, tuple(range(len(p.mcs_index))),
            batch_size=int(sched["batch_size"][0]),
            double_readout=bool(sched["double_readout"][0]),
            weighting=float(sched["weighting_double_readout"][0]),
            apply_multiloss=bool(sched["apply_multiloss"][0]),
            train_tx=False, chunk=10)
        step.set_snr_range(sched["min_training_snr_db"][0],
                           sched["max_training_snr_db"][0])
        # warm up (compile outside the trace)
        params, opt_state, losses = step(params, opt_state,
                                         jax.random.PRNGKey(1))
        np.asarray(losses[-1])
        tdir = os.path.join(args.out, "train")
        with jax.profiler.trace(tdir):
            for i in range(args.steps):
                params, opt_state, losses = step(
                    params, opt_state, jax.random.PRNGKey(2 + i))
            np.asarray(losses[-1])  # force device->host sync
        print(f"train trace -> {tdir}")

    if "infer" in args.what:
        import __graft_entry__ as g
        fn, (params, y) = g.entry()
        fn_s = jax.jit(lambda p_, y_: jnp.sum(fn(p_, y_)
                                              .astype(jnp.float32)))
        np.asarray(fn_s(params, y))  # compile
        idir = os.path.join(args.out, "infer")
        with jax.profiler.trace(idir):
            for _ in range(max(args.steps * 10, 20)):
                out = fn_s(params, y)
            np.asarray(out)
        print(f"infer trace -> {idir}")


if __name__ == "__main__":
    main()
