"""Long-running nrx_rt training segment (TPU, resumable).

Runs the config's training schedule with wall-clock-bounded segments:
resumes from the latest checkpoint, trains until --seconds elapse, then
checkpoints and exits cleanly (the axon TPU tunnel is single-client, so
training runs in segments between evaluation windows).
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
    ap.add_argument("--seconds", type=float, default=3600)
    ap.add_argument("--weights-dir", default="weights")
    ap.add_argument("--log-dir", default="logs")
    ap.add_argument("--warm-start-from", default=None,
                    help="weights .pkl to initialize from when no "
                         "checkpoint exists (e.g. UMi-trained nrx_rt "
                         "weights for site-specific fine-tuning; "
                         "reference flow: train_neural_rx.py warm "
                         "start, train_neural_rx.py:96-101)")
    ap.add_argument("--lr-override", type=float, default=None,
                    help="override the schedule's learning rate (e.g. "
                         "a final annealed segment at 1e-4 when the "
                         "full 10M-iteration budget is out of reach)")
    ap.add_argument("--ckpt-name", default=None,
                    help="checkpoint/weights basename (default: config "
                         "label). Use a distinct name for experimental "
                         "branches (lr anneals) so the main resumable "
                         "checkpoint is untouched")
    ap.add_argument("--warm-start-partial", action="store_true",
                    help="with --warm-start-from: copy only the leaves "
                         "whose path+shape match the new model (cross-"
                         "MCS transfer, e.g. nrx_rt -> nrx_rt_qpsk where "
                         "only the LLR-readout head differs)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug/smoke)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 CGNN compute during training (params, "
                         "optimizer and losses stay f32). The reference "
                         "trains f32 (nrx_rt.cfg nrx_dtype); this is a "
                         "TPU-native opt-in — A/B the eval-loss "
                         "trajectory before adopting for long runs")
    ap.add_argument("--from-scratch", action="store_true",
                    help="allow random-init training when no checkpoint "
                         "exists even though a trained weights file for "
                         "this label is present (guards against silently "
                         "restarting a long run after a lost ckpt: the "
                         "gitignored *_ckpt.pkl can disappear between "
                         "sessions while the committed *_weights.pkl "
                         "survives)")
    ap.add_argument("--start-step", type=int, default=0,
                    help="seed the cumulative step counter when warm-"
                         "starting without a checkpoint (keeps the lr "
                         "schedule phase and eval logs truthful when "
                         "rebuilding a lost ckpt from saved weights)")
    ap.add_argument("--ema-decay", type=float, default=0.998,
                    help="per-100-iteration-chunk Polyak/EMA decay for "
                         "an averaged weight copy saved alongside the "
                         "raw weights (window ~50k iters at the "
                         "default); 0 disables")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.sim.training import (make_chunk_step,
                                            save_checkpoint,
                                            load_checkpoint, save_weights,
                                            load_weights,
                                            merge_matching_leaves)
    import numpy as np
    import json

    p = Parameters(args.config, system="nrx", training=True)
    if args.bf16:
        import jax.numpy as jnp
        p.nrx_dtype = jnp.bfloat16
    model = E2EModel(p, training=True)
    params = model.init_params(jax.random.PRNGKey(42))

    sched = p.training_schedule
    base = args.ckpt_name or p.label
    ckpt_path = os.path.join(args.weights_dir, f"{base}_ckpt.pkl")
    if args.ckpt_name and not os.path.exists(ckpt_path) \
            and args.warm_start_from is None:
        # branch: seed the experimental checkpoint from the main one
        main_ckpt = os.path.join(args.weights_dir, f"{p.label}_ckpt.pkl")
        if os.path.exists(main_ckpt):
            import shutil
            shutil.copy(main_ckpt, ckpt_path)
            print(f"branched {ckpt_path} from {main_ckpt}", flush=True)

    # figure out phase boundaries
    iters_per_phase = [int(x) for x in sched["num_iter"]]

    def phase_of(step):
        acc = 0
        for i, ni in enumerate(iters_per_phase):
            if step < acc + ni:
                return i
            acc += ni
        return None

    step0 = 0
    ckpt = None
    if os.path.exists(ckpt_path):
        ckpt = load_checkpoint(ckpt_path)
        step0 = ckpt[2]
    else:
        # No checkpoint. If trained weights for this label already exist,
        # refuse to silently restart from random init (a lost gitignored
        # ckpt must not erase a multi-million-iteration run): warm start
        # from the saved weights instead unless --from-scratch.
        saved = os.path.join(args.weights_dir, f"{base}_weights.pkl")
        if (args.warm_start_from is None and not args.from_scratch
                and os.path.exists(saved)):
            args.warm_start_from = saved
            print(f"no ckpt at {ckpt_path}; auto warm start from {saved} "
                  f"(pass --from-scratch to random-init instead)",
                  flush=True)
        if args.warm_start_from is not None:
            step0 = args.start_step
    start_phase = phase_of(step0)
    if start_phase is None:
        print("schedule complete")
        return
    lr0 = (args.lr_override if args.lr_override is not None
           else float(sched["learning_rate"][start_phase]))
    optimizer = optax.adam(lr0)
    if ckpt is not None:
        params, opt_state, step0 = ckpt
        print(f"resumed from step {step0} (phase {start_phase}, "
              f"lr {lr0})", flush=True)
    elif args.warm_start_from:
        src = load_weights(args.warm_start_from)
        if args.warm_start_partial:
            params, copied, kept = merge_matching_leaves(params, src)
            print(f"partial warm start from {args.warm_start_from}: "
                  f"{copied} leaves copied, {kept} kept at init",
                  flush=True)
        else:
            params = src
            print(f"warm start from {args.warm_start_from}", flush=True)
        opt_state = optimizer.init(params)
    else:
        opt_state = optimizer.init(params)

    # Polyak/EMA averaged copy (TPU-native extra over the reference's
    # raw-weights saves, utils.py:34-50): averaged weights are usually
    # worth a few tenths of a dB when the full 10M-iteration schedule
    # is out of reach. Sidecar file, host-side numpy, updated per chunk.
    ema_path = os.path.join(args.weights_dir, f"{base}_ema.pkl")
    ema = None
    ema_update = None
    fresh_init = ckpt is None and args.warm_start_from is None
    if args.ema_decay > 0:
        if fresh_init and os.path.exists(ema_path):
            # a sidecar EMA from an unrelated earlier run must not be
            # averaged into a random init
            ema = params
            print(f"ignoring stale {ema_path} (fresh init)", flush=True)
        elif os.path.exists(ema_path):
            ema = jax.device_put(load_weights(ema_path))
            print(f"resumed EMA from {ema_path}", flush=True)
        else:
            ema = params
        # EMA stays ON DEVICE: a host pull through the axon tunnel is
        # ~per-leaf round trips (~5 s/pull measured), which at one pull
        # per 500 iters capped the whole run at ~37 it/s vs the 64 it/s
        # compute rate. decay^5 keeps the per-100-chunk averaging
        # window while updating every 5th chunk.
        d5 = float(args.ema_decay ** 5)
        ema_update = jax.jit(
            lambda e, q: jax.tree.map(
                lambda a, b: d5 * a + (1.0 - d5) * b, e, q),
            donate_argnums=0)

    log_path = os.path.join(args.log_dir, f"{base}.jsonl")
    os.makedirs(args.log_dir, exist_ok=True)
    log_f = open(log_path, "a")

    t_end = time.time() + args.seconds
    total = step0
    while time.time() < t_end:
        # phase bookkeeping
        phase = phase_of(total)
        acc = sum(iters_per_phase[:phase]) if phase is not None else 0
        if phase is None:
            print("schedule complete", flush=True)
            break
        lr = (args.lr_override if args.lr_override is not None
              else float(sched["learning_rate"][phase]))
        if lr != lr0:
            # optax.adam's state is lr-independent: rebuild the
            # transform, KEEP the moments (reference semantics —
            # one Adam across the whole schedule, utils.py:228)
            lr0 = lr
            optimizer = optax.adam(lr)
        step_fn = make_chunk_step(
            model, p, optimizer, list(range(len(p.mcs_index))),
            int(sched["batch_size"][phase]),
            bool(sched["double_readout"][phase]),
            float(sched["weighting_double_readout"][phase]),
            bool(sched["apply_multiloss"][phase]),
            bool(sched["train_tx"][phase]), chunk=100)
        step_fn.set_snr_range(
            np.asarray(sched["min_training_snr_db"][phase], np.float32),
            np.asarray(sched["max_training_snr_db"][phase], np.float32))

        key = jax.random.PRNGKey(1000 + total)
        phase_end = acc + iters_per_phase[phase]
        while total < phase_end and time.time() < t_end:
            key, sub = jax.random.split(key)
            t0 = time.time()
            params, opt_state, (ld, lc, loss) = step_fn(params,
                                                        opt_state, sub)
            total += 100
            if ema_update is not None and total % 500 == 0:
                ema = ema_update(ema, params)
            # ONE host transfer for the three loss scalars (three
            # separate float() syncs are three tunnel round trips)
            ld, lc, loss = np.asarray(
                jax.device_get(jnp.stack([ld, lc, loss])))
            rec = {"phase": phase, "iter": total,
                   "loss_data": float(ld), "loss_chest": float(lc),
                   "loss": float(loss),
                   "iters_per_s": 100 / (time.time() - t0)}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            if total % 5000 == 0:
                save_checkpoint(ckpt_path, params, opt_state, total)
                if ema is not None:
                    save_weights(ema_path, ema)
                print(f"iter {total} loss {rec['loss']:.4f} "
                      f"({rec['iters_per_s']:.1f} it/s)", flush=True)

    save_checkpoint(ckpt_path, params, opt_state, total)
    save_weights(os.path.join(args.weights_dir,
                              f"{base}_weights.pkl"), params)
    if ema is not None:
        save_weights(ema_path, ema)
        save_weights(os.path.join(args.weights_dir,
                                  f"{base}_ema_weights.pkl"), ema)
    print(f"segment done at iter {total}", flush=True)


if __name__ == "__main__":
    main()
