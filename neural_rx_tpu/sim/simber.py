"""Monte-Carlo BER/BLER simulation driver with early stopping.

TPU-native replacement for Sionna's `sim_ber` as used by the reference
(`scripts/evaluate.py:193-202`): a jitted per-SNR-point evaluation step
returning integer error counters, an outer Python loop accumulating
Monte-Carlo iterations with early stopping on a target number of block
errors or a BLER floor, and incremental result persistence keyed
`(system_name, num_tx, mcs_idx)` like the reference's results pickles.

Multi-device: the eval step can be wrapped in a data-parallel pjit mesh;
counters are summed on host (the Monte-Carlo axis is embarrassingly
parallel, SURVEY.md §2.11).
"""

from __future__ import annotations

import os
import pickle
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp


def make_eval_step(model, params_holder, mcs_arr_eval_idx: int = 0,
                   num_it: int | None = None, fast_ldpc: bool = False):
    """Jitted (params, key, ebno_db) -> integer error counters."""

    def step(params, key, batch_size, ebno_db):
        kwargs = {}
        if fast_ldpc:
            kwargs["fast_ldpc"] = True
        b, b_hat, crc = model(params, key, batch_size, ebno_db,
                              mcs_arr_eval_idx=mcs_arr_eval_idx,
                              num_it=num_it, **kwargs)
        # b is [batch, T, tb] for the standard models, [batch, tb] for
        # the single-UE mixed-MCS wrappers — one TB per leading element
        # either way
        errs = jnp.sum(jnp.abs(b - b_hat), axis=-1)
        bit_errors = jnp.sum(errs)
        block_errors = jnp.sum((errs > 0).astype(jnp.int32))
        num_bits = int(np.prod(b.shape))
        num_blocks = int(np.prod(b.shape[:-1]))
        return (bit_errors.astype(jnp.int64), jnp.int64(num_bits),
                block_errors.astype(jnp.int64), jnp.int64(num_blocks))

    return jax.jit(step, static_argnames=("batch_size",))


def sim_ber(model, params, ebno_dbs, batch_size: int,
            max_mc_iter: int = 100, num_target_block_errors: int = 200,
            target_bler: float | None = None,
            mcs_arr_eval_idx: int = 0, num_it: int | None = None,
            seed: int = 0, verbose: bool = True, mesh=None,
            fast_ldpc: bool = False, return_counts: bool = False,
            point_callback=None):
    """Monte-Carlo sweep. Returns (ber, bler) arrays over ebno_dbs;
    with return_counts=True additionally (block_errors, num_blocks)
    integer arrays so callers can attach binomial confidence intervals
    (see `bler_confidence_interval`).

    Early stop per SNR point once `num_target_block_errors` block errors
    are collected; the whole sweep stops early once the measured BLER
    drops below `target_bler` (reference evaluate.py early-stop args).

    point_callback(ebno_db, ber, bler), if given, fires after every
    completed SNR point — callers persist partial sweeps so a timeout
    kill cannot lose finished points.

    mesh: optional ("data","grid") jax mesh — the Monte-Carlo batch axis
    shards over "data" (the reference's sim_ber distribute="all" role,
    SURVEY.md §2.11); error counters reduce to host scalars.

    Multi-process (jax.process_count() > 1, after jax.distributed
    initialization), two mutually exclusive modes:
    - mesh=None (or a process-local mesh): each process draws an
      independent per-host PRNG stream (dist.multihost.host_fold_key)
      and evaluates its own `batch_size` samples per iteration; the
      four error counters are all-gathered and summed across processes
      every iteration, so early stopping is decided on GLOBAL counts
      and every process takes the same branch. Reference analog:
      sim_ber(distribute="all"), evaluate.py:61.
    - mesh spanning all processes (dist.multihost.global_mesh): one
      global pjit computation; all processes pass the same key, the
      counters are already global, and no extra reduction happens.
    """
    if mesh is not None:
        model.mesh = mesh
    step = make_eval_step(model, None, mcs_arr_eval_idx, num_it,
                          fast_ldpc=fast_ldpc)
    if mesh is not None:
        _inner = step

        def step(params, key, batch_size, ebno):  # noqa: F811
            with mesh:
                return _inner(params, key, batch_size, ebno)
    n_proc = jax.process_count()
    key = jax.random.PRNGKey(seed)
    # Two distinct multi-process modes, never combined:
    # (a) mesh spans all processes (global pjit): ONE global computation,
    #     every process passes the SAME key and already sees GLOBAL
    #     counters — no fold, no allgather (folding keys would feed
    #     inconsistent replicated inputs; allgather would double-count).
    # (b) no cross-process mesh: independent per-host loops — fold a
    #     per-host PRNG stream and allgather+sum counters each iteration.
    mesh_spans_processes = mesh is not None and any(
        d.process_index != jax.process_index()
        for d in np.asarray(mesh.devices).flat)
    reduce_across = n_proc > 1 and not mesh_spans_processes
    if n_proc > 1:
        verbose = verbose and jax.process_index() == 0
    if reduce_across:
        from ..dist.multihost import host_fold_key
        key = host_fold_key(key)
    ebno_dbs = np.asarray(ebno_dbs, np.float32)
    bers = np.full(len(ebno_dbs), np.nan)
    blers = np.full(len(ebno_dbs), np.nan)
    blk_errs = np.zeros(len(ebno_dbs), np.int64)
    blk_tot = np.zeros(len(ebno_dbs), np.int64)
    for i, ebno in enumerate(ebno_dbs):
        be = nb = ble = nbl = 0
        t0 = time.time()
        for it in range(max_mc_iter):
            key, sub = jax.random.split(key)
            r = step(params, sub, batch_size, jnp.float32(ebno))
            r = np.asarray([int(r[0]), int(r[1]), int(r[2]), int(r[3])],
                           np.int64)
            if reduce_across:
                from jax.experimental import multihost_utils
                r = np.asarray(
                    multihost_utils.process_allgather(r)).sum(axis=0)
            be += int(r[0]); nb += int(r[1])
            ble += int(r[2]); nbl += int(r[3])
            if ble >= num_target_block_errors:
                break
        bers[i] = be / max(nb, 1)
        blers[i] = ble / max(nbl, 1)
        blk_errs[i], blk_tot[i] = ble, nbl
        if verbose:
            print(f"Eb/No {ebno:5.1f} dB | BER {bers[i]:.4e} | "
                  f"BLER {blers[i]:.4e} | blocks {nbl} | "
                  f"{time.time()-t0:.1f}s", flush=True)
        if point_callback is not None:
            point_callback(float(ebno), float(bers[i]), float(blers[i]))
        if target_bler is not None and blers[i] < target_bler:
            break
    if return_counts:
        return bers, blers, blk_errs, blk_tot
    return bers, blers


def bler_confidence_interval(block_errors: int, num_blocks: int,
                             z: float = 1.96):
    """Wilson score interval for a BLER estimate (95% by default)."""
    if num_blocks <= 0:
        return (float("nan"), float("nan"))
    p = block_errors / num_blocks
    denom = 1 + z ** 2 / num_blocks
    center = (p + z ** 2 / (2 * num_blocks)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / num_blocks
                                 + z ** 2 / (4 * num_blocks ** 2))
    return (max(center - half, 0.0), min(center + half, 1.0))


def save_results(path: str, label: str, system_name: str, num_tx: int,
                 mcs_idx: int, ebno_dbs, bers, blers):
    """Append-update a results pickle keyed (system, num_tx, mcs_idx)
    (reference evaluate.py:116-125,203-206 format: ONE shared SNR grid
    per pickle). Sweeps run at different grids are merged onto the
    union grid, NaN-padding every curve where it was not measured —
    without this, a shorter re-run would silently misalign previously
    saved curves against the stored grid."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # round to 1e-6 dB so float32-arange-derived and float64-literal
    # grids describing the same nominal SNR collapse to one union point
    # (e.g. evaluate_all's arange vs an explicit --snr list)
    new_e = np.round(np.asarray(ebno_dbs, np.float64), 6)
    if os.path.exists(path):
        with open(path, "rb") as f:
            ebno_arr, ber_d, bler_d = pickle.load(f)
        ebno_arr = np.round(np.asarray(ebno_arr, np.float64), 6)
    else:
        ebno_arr, ber_d, bler_d = new_e, {}, {}

    union = np.union1d(ebno_arr, new_e)

    def remap(curve, grid):
        curve = np.asarray(curve, np.float64)
        if len(curve) != len(grid):
            warnings.warn(
                f"save_results({path}): curve length {len(curve)} != "
                f"grid length {len(grid)}; extra entries dropped")
        n = min(len(curve), len(grid))
        out = np.full(len(union), np.nan)
        for i in range(n):
            j = int(np.argmin(np.abs(union - grid[i])))
            out[j] = curve[i]
        return out

    if not np.array_equal(union, ebno_arr):
        ber_d = {k: remap(v, ebno_arr) for k, v in ber_d.items()}
        bler_d = {k: remap(v, ebno_arr) for k, v in bler_d.items()}
    keyname = (system_name, num_tx, mcs_idx)

    def merge(d, curve):
        """New measurements win where measured; previously stored
        points survive elsewhere (per-point incremental saves append
        one SNR point at a time)."""
        new = remap(curve, new_e)
        old = d.get(keyname)
        if old is not None:
            old = np.asarray(old, np.float64)
            d[keyname] = np.where(np.isnan(new), old, new)
        else:
            d[keyname] = new

    merge(ber_d, bers)
    merge(bler_d, blers)
    with open(path, "wb") as f:
        pickle.dump((union, ber_d, bler_d), f)
