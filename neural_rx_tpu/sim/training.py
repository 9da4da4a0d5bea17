"""Training loop: phased schedule, randomized users/MCS/SNR, optax Adam.

TPU-native replacement for the reference `training_loop`
(`utils/utils.py:148-428`): the same sampling semantics — triangular
user-count sampler biased toward more users, per-UE MCS sampling (uniform
or explicit probabilities), SNR uniform in a per-user-count range plus
per-MCS offsets over active ports, random DMRS slots — but as a pure
jitted step with `lax.scan` over a 100-iteration chunk (the reference
compiles 100 SGD iterations into one graph) and donated buffers.

Checkpoints carry params + optimizer state + step (reference anti-goal:
weights-only pickles, SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax


def triangular_sample(key, minimum: int, maximum: int):
    """Triangular user-count sample in [minimum, maximum], biased to the
    maximum (reference TriangularDistributionSampler, utils.py:72-127:
    x = floor(a + sqrt(u) * (b - a)) with b = max + 1)."""
    u = jax.random.uniform(key, ())
    x = minimum + jnp.sqrt(u) * (maximum + 1 - minimum)
    return jnp.minimum(jnp.floor(x).astype(jnp.int32), maximum)


def sample_mcs_assignment(key, batch_size: int, max_num_tx: int,
                          mcs_arr_training_idx, num_mcs: int,
                          num_tx=None, min_num_tx: int = 1,
                          mcs_training_probs=None):
    """Per-UE MCS index + one-hot mask (reference utils.py:259-285)."""
    idx_arr = jnp.asarray(mcs_arr_training_idx, jnp.int32)
    if mcs_training_probs is None:
        r = jax.random.randint(key, (batch_size, max_num_tx), 0,
                               len(mcs_arr_training_idx))
        mcs_idx = idx_arr[r]
    else:
        probs = jnp.asarray(mcs_training_probs, jnp.float32)
        p = probs[num_tx - min_num_tx]
        cdf = jnp.cumsum(jnp.concatenate([jnp.zeros(1), p / jnp.sum(p)]))
        u = jax.random.uniform(key, (batch_size, max_num_tx, 1))
        cond = (u >= cdf[:-1]) & (u < cdf[1:])
        mcs_idx = jnp.sum(idx_arr[None, None] * cond.astype(jnp.int32), -1)
    return mcs_idx, jax.nn.one_hot(mcs_idx, num_mcs)


def make_chunk_step(model, sys_parameters, optimizer,
                    mcs_arr_training_idx, batch_size: int,
                    double_readout: bool, weighting: float,
                    apply_multiloss: bool, train_tx: bool,
                    chunk: int = 100):
    """Build a jitted function running `chunk` SGD iterations.

    The per-user-count SNR ranges are TRACED arguments of the jitted
    chunk, so one compiled chunk serves every schedule phase with the
    same static flags (batch/multiloss/readout). `set_snr_range(lo, hi)`
    stores the arrays passed to subsequent calls.
    """
    p = sys_parameters
    num_mcs = len(p.mcs_index)
    mcs_probs = getattr(p, "mcs_training_probs", None)
    snr_offsets = getattr(p, "mcs_training_snr_db_offset", None)
    if snr_offsets is not None:
        snr_offsets = jnp.asarray(snr_offsets, jnp.float32)

    from .e2e import sample_active_dmrs

    def loss_fn(params, key, min_snr_db, max_snr_db):
        keys = jax.random.split(key, 5)
        num_tx = triangular_sample(keys[0], p.min_num_tx, p.max_num_tx)
        mcs_idx, mcs_ue_mask = sample_mcs_assignment(
            keys[1], batch_size, p.max_num_tx, mcs_arr_training_idx,
            num_mcs, num_tx=num_tx, min_num_tx=p.min_num_tx,
            mcs_training_probs=mcs_probs)
        lo = min_snr_db[num_tx - p.min_num_tx]
        hi = max_snr_db[num_tx - p.min_num_tx]
        snr_db = jax.random.uniform(keys[2], (batch_size,), minval=lo,
                                    maxval=hi)
        active_dmrs = sample_active_dmrs(keys[3], batch_size, num_tx,
                                         p.max_num_tx)
        if snr_offsets is not None:
            off = snr_offsets[num_tx - 1][mcs_idx]  # [b, T]
            snr_db = snr_db + jnp.sum(off * active_dmrs, axis=1)
        loss_data, loss_chest = model(
            params, keys[4], batch_size, snr_db, num_tx=num_tx,
            active_dmrs=active_dmrs, mcs_ue_mask=mcs_ue_mask,
            apply_multiloss=apply_multiloss)
        loss = loss_data + (weighting * loss_chest if double_readout
                            else 0.0)
        return loss, (loss_data, loss_chest)

    def one_step(carry, key):
        params, opt_state, lo, hi = carry
        (loss, (ld, lc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, key, lo, hi)
        if "constellation" in params and not train_tx:
            grads = dict(grads)
            grads["constellation"] = jax.tree.map(
                jnp.zeros_like, params["constellation"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, lo, hi), (ld, lc, loss)

    @jax.jit
    def _chunk(params, opt_state, key, min_snr_db, max_snr_db):
        keys = jax.random.split(key, chunk)
        (params, opt_state, _, _), losses = jax.lax.scan(
            one_step, (params, opt_state, min_snr_db, max_snr_db), keys)
        ld, lc, loss = (x[-1] for x in losses)
        return params, opt_state, (ld, lc, loss)

    snr_range = [np.zeros(p.max_num_tx - p.min_num_tx + 1, np.float32),
                 np.ones(p.max_num_tx - p.min_num_tx + 1, np.float32)]

    def chunk_step(params, opt_state, key):
        return _chunk(params, opt_state, key,
                      jnp.asarray(snr_range[0]), jnp.asarray(snr_range[1]))

    chunk_step.set_snr_range = lambda lo, hi: (
        snr_range.__setitem__(0, np.asarray(lo, np.float32)),
        snr_range.__setitem__(1, np.asarray(hi, np.float32)))
    return chunk_step


def make_eval_loss_fn(model, sys_parameters, batch_size: int = 32):
    """Per-MCS eval-loss monitor at the config's eval_ebno_db_arr
    (reference utils.py:352-356,407-428: logged every
    num_iter_train_save iterations)."""
    p = sys_parameters
    ebnos = [float(e) for e in p.eval_ebno_db_arr]

    @jax.jit
    def _loss(params, key, ebno, mcs_ue_mask):
        ld, lc = model(params, key, batch_size,
                       jnp.full((batch_size,), ebno),
                       active_dmrs=jnp.ones((batch_size, p.max_num_tx)),
                       mcs_ue_mask=mcs_ue_mask)
        return ld

    def eval_losses(params, key):
        out = {}
        for idx, ebno in enumerate(ebnos):
            mm = jnp.tile(jax.nn.one_hot(idx, len(p.mcs_index))[None,
                                                                None],
                          (batch_size, p.max_num_tx, 1))
            out[f"eval_loss_mcs{idx}"] = float(
                _loss(params, jax.random.fold_in(key, idx),
                      jnp.float32(ebno), mm))
        return out
    return eval_losses


def save_checkpoint(path, params, opt_state, step: int):
    leaves, treedef = jax.tree.flatten((params, opt_state))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": treedef, "step": step}, f)


def load_checkpoint(path, params_template=None, opt_state_template=None):
    with open(path, "rb") as f:
        d = pickle.load(f)
    params, opt_state = jax.tree.unflatten(d["treedef"], d["leaves"])
    return params, opt_state, d["step"]


def save_weights(path, params):
    """Weights-only save (reference save_weights analog, utils.py:34-50)."""
    leaves, treedef = jax.tree.flatten(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": treedef}, f)


def load_weights(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return jax.tree.unflatten(d["treedef"], d["leaves"])


def merge_matching_leaves(dst, src):
    """Copy every leaf of `src` into `dst` whose tree path and shape both
    match; keep `dst`'s leaf otherwise. Cross-config warm-start transfer
    (e.g. nrx_rt -> nrx_rt_qpsk, where only the per-MCS LLR-readout head
    differs; reference warm start is same-config only,
    train_neural_rx.py:96-101). Returns (merged, copied, kept)."""
    flat_src = {jax.tree_util.keystr(kp): v for kp, v in
                jax.tree_util.tree_flatten_with_path(src)[0]}
    copied = kept = 0

    def pick(kp, v):
        nonlocal copied, kept
        s = flat_src.get(jax.tree_util.keystr(kp))
        if s is not None and np.shape(s) == np.shape(v):
            copied += 1
            return s
        kept += 1
        return v

    return jax.tree_util.tree_map_with_path(pick, dst), copied, kept


def training_loop(model, sys_parameters, params, label: str,
                  mcs_arr_training_idx=None, seed: int = 42,
                  results_dir: str = "weights", log_dir: str = "logs",
                  chunk: int = 100, max_iters: int | None = None,
                  eval_fn=None, verbose: bool = True,
                  weight_saving_schedule=None):
    """Phased training per the config's training_schedule
    (reference utils.py:148-428). Returns trained params.

    max_iters caps the total SGD iterations (smoke runs / CI).
    """
    p = sys_parameters
    sched = p.training_schedule
    num_phases = len(sched["num_iter"])
    if mcs_arr_training_idx is None:
        mcs_arr_training_idx = list(range(len(p.mcs_index)))

    key = jax.random.PRNGKey(seed)
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, f"{label}.jsonl")
    log_f = open(log_path, "a")

    total_done = 0
    for phase in range(num_phases):
        num_iter = int(sched["num_iter"][phase])
        lr = float(sched["learning_rate"][phase])
        batch_size = int(sched["batch_size"][phase])
        train_tx = bool(sched["train_tx"][phase])
        double_readout = bool(sched["double_readout"][phase])
        apply_multiloss = bool(sched["apply_multiloss"][phase])
        weighting = float(sched["weighting_double_readout"][phase])
        min_snr = np.asarray(sched["min_training_snr_db"][phase],
                             np.float32)
        max_snr = np.asarray(sched["max_training_snr_db"][phase],
                             np.float32)

        optimizer = optax.adam(lr)
        opt_state = optimizer.init(params)
        step_fn = make_chunk_step(
            model, p, optimizer, mcs_arr_training_idx, batch_size,
            double_readout, weighting, apply_multiloss, train_tx,
            chunk=chunk)
        step_fn.set_snr_range(min_snr, max_snr)

        it = 0
        while it < num_iter:
            if max_iters is not None and total_done >= max_iters:
                break
            key, sub = jax.random.split(key)
            t0 = time.time()
            params, opt_state, (ld, lc, loss) = step_fn(params, opt_state,
                                                        sub)
            it += chunk
            total_done += chunk
            rec = {"phase": phase, "iter": total_done,
                   "loss_data": float(ld), "loss_chest": float(lc),
                   "loss": float(loss),
                   "iters_per_s": chunk / (time.time() - t0)}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            if verbose:
                print(f"[{label}] phase {phase} iter {total_done} "
                      f"loss {rec['loss']:.4f} "
                      f"({rec['iters_per_s']:.1f} it/s)", flush=True)
            if total_done % 1000 == 0 or (max_iters is not None
                                          and total_done >= max_iters):
                save_checkpoint(os.path.join(
                    results_dir, f"{label}_ckpt.pkl"), params, opt_state,
                    total_done)
                if eval_fn is not None:
                    eval_fn(params, total_done)
            if weight_saving_schedule:
                # named-iteration snapshots (reference
                # weight_saving_schedule, utils.py:345-347)
                for snap in weight_saving_schedule:
                    if total_done - chunk < snap <= total_done:
                        save_weights(os.path.join(
                            results_dir,
                            f"{label}_weights_iter_{snap}.pkl"), params)
        if max_iters is not None and total_done >= max_iters:
            break

    save_weights(os.path.join(results_dir, f"{label}_weights.pkl"), params)
    log_f.close()
    return params
