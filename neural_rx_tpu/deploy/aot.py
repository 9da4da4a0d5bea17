"""AOT compilation of fixed-shape receiver executables per PRB bucket.

Replaces the reference's TensorRT engine build with min/opt/max
dynamic-shape profiles (scripts/export_onnx.py:196-212): XLA wants
static shapes, so we compile one executable per PRB bucket and dispatch
to the smallest bucket that fits (masking unused subcarriers). This is
the same strategy the reference's LMMSE baselines use for large
bandwidths (fixed chunk sizes) and is how the TRT profile set is
actually consumed by Aerial (a handful of discrete shapes).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


DEFAULT_PRB_BUCKETS = (4, 16, 32, 64, 132, 273)


class BucketedReceiver:
    """Per-bucket AOT-compiled Aerial receivers with pad-to-bucket
    dispatch (the reference serves any PRB count via dynamic-shape TRT
    profiles, export_onnx.py:147-160; XLA's analog is one executable per
    bucket plus a runtime valid-width input).

    A request at a non-bucket `n_prb` is served by the smallest bucket
    that fits: the received slot is zero-padded on the subcarrier axis,
    the LS pilot estimates are scattered into the bucket's pilot
    enumeration, the engine runs with `num_valid_sc = 12*n_prb` (which
    drives a valid-region power norm, a valid-width positional encoding,
    and per-conv-layer re-zeroing of the pad — see cgnn_apply), and the
    LLR output is cropped back. For type-1 comb DMRS (the deployed nrx
    family) the cropped LLRs are bit-identical to a direct execution at
    n_prb (engine.pad_dispatch_exact reports this).
    """

    def __init__(self, make_engine, params, batch_size: int = 1,
                 buckets=DEFAULT_PRB_BUCKETS):
        """make_engine: n_prb -> (engine, example_inputs) with engine an
        `deploy.aerial.AerialNRX`-compatible callable exposing `n_sc`,
        `num_pilots`, `pilot_sc`, and accepting a trailing
        `num_valid_sc` argument."""
        self.buckets = tuple(sorted(buckets))
        self.compiled = {}
        self.engines = {}
        self.params = params
        self.compile_times = {}
        self._pilot_scatter_cache = {}
        for n_prb in self.buckets:
            engine, example = make_engine(n_prb)
            self.engines[n_prb] = engine
            t0 = time.time()
            fn = lambda p, *a: engine(p, *a[:-1], num_valid_sc=a[-1])
            lowered = jax.jit(fn).lower(
                params, *example, np.int32(engine.n_sc))
            self.compiled[n_prb] = lowered.compile()
            self.compile_times[n_prb] = time.time() - t0

    def bucket_for(self, n_prb: int) -> int:
        for b in self.buckets:
            if n_prb <= b:
                return b
        raise ValueError(f"{n_prb} PRBs exceeds largest bucket")

    def _pilot_scatter(self, bucket: int, valid_sc: int):
        """Bucket-pilot indices whose subcarrier is in the valid region,
        per tx — the positions the caller's n_prb pilot axis maps to
        (both enumerations are (sym, sc)-sorted, so order matches)."""
        key = (bucket, valid_sc)
        if key not in self._pilot_scatter_cache:
            eng = self.engines[bucket]
            idx = [np.flatnonzero(eng.pilot_sc[tx] < valid_sc)
                   for tx in range(eng.pilot_sc.shape[0])]
            n = {len(i) for i in idx}
            assert len(n) == 1, "per-tx valid pilot counts differ"
            self._pilot_scatter_cache[key] = np.stack(idx)  # [T, P_valid]
        return self._pilot_scatter_cache[key]

    def run(self, n_prb: int, rx_slot_real, rx_slot_imag, h_hat_real,
            h_hat_imag, dmrs_port_mask):
        b = self.bucket_for(n_prb)
        eng = self.engines[b]
        valid_sc = 12 * n_prb
        if valid_sc == eng.n_sc:
            return self.compiled[b](self.params, rx_slot_real,
                                    rx_slot_imag, h_hat_real, h_hat_imag,
                                    dmrs_port_mask, np.int32(valid_sc))
        if not getattr(eng, "pad_dispatch_exact", False):
            # e.g. type-2 DMRS: the bucket's NN gather can select a
            # pilot from a later PRB that arrives zero-padded, silently
            # diverging from the direct-shape LLRs. Refuse instead.
            raise ValueError(
                f"engine for bucket {b} cannot serve {n_prb} PRBs by "
                "padding (pilot gathers cross PRB boundaries); compile "
                "an exact-shape engine for this PRB count instead")
        pad = eng.n_sc - valid_sc
        yr = jnp.pad(rx_slot_real, ((0, 0), (0, pad), (0, 0), (0, 0)))
        yi = jnp.pad(rx_slot_imag, ((0, 0), (0, pad), (0, 0), (0, 0)))
        idx = self._pilot_scatter(b, valid_sc)  # [T, P_valid]
        if h_hat_real.shape[1] != idx.shape[1]:
            raise ValueError(
                f"expected {idx.shape[1]} pilots for {n_prb} PRBs, "
                f"got {h_hat_real.shape[1]}")

        def scatter(h):  # [b, P_valid, T, ant] -> [b, P_bucket, T, ant]
            out = jnp.zeros((h.shape[0], eng.num_pilots) + h.shape[2:],
                            h.dtype)
            for tx in range(idx.shape[0]):
                out = out.at[:, idx[tx], tx].set(h[:, :, tx])
            return out

        llr, h_hat = self.compiled[b](
            self.params, yr, yi, scatter(h_hat_real),
            scatter(h_hat_imag), dmrs_port_mask, np.int32(valid_sc))
        # Aerial output layout [b, T, sc, sym, ch] -> crop the pad
        return llr[:, :, :valid_sc], h_hat[:, :, :valid_sc]


def serialize_engine(fn, args, path: str) -> int:
    """Persist a receiver engine as a serialized StableHLO executable
    (jax.export) — the framework's analog of the reference's TensorRT
    `.plan` artifact (export_onnx.py:196-212). Returns the byte size.

    The artifact is loadable in a fresh process with `load_engine` and
    runs without the model-construction code path (config parsing, PE
    precompute, ...), which is the deployment property the `.plan` file
    provides Aerial."""
    from jax import export as jexport
    exp = jexport.export(jax.jit(fn))(*args)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_engine(path: str):
    """Load a `serialize_engine` artifact -> callable(*args)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def serialize_compiled(compiled, path: str) -> int:
    """Persist a COMPILED XLA executable (jax.experimental
    .serialize_executable) — unlike `serialize_engine` (StableHLO,
    recompiled at load), this is the machine-code-level TRT `.plan`
    analog: loading skips XLA compilation entirely, which matters for
    the whole-grid/mega engines whose TPU compile runs minutes
    (BENCH_r04: 372 s trace-time compile before the first timed slot).
    Returns the byte size."""
    import pickle
    from jax.experimental import serialize_executable as se
    payload, in_tree, out_tree = se.serialize(compiled)
    blob = pickle.dumps({"payload": payload, "in_tree": in_tree,
                         "out_tree": out_tree})
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_compiled(path: str):
    """Load a `serialize_compiled` artifact -> the compiled callable.
    Device/runtime-specific (like a TRT plan): the artifact only loads
    on the platform it was compiled for; callers should fall back to a
    fresh compile on failure. Measured 2026-08-21: the axon TPU runtime
    REJECTS artifacts compiled by the chip-free v5e topology client
    (scripts/offline_aot_engine.py), so a deployable artifact must come
    from a chip-attached compile once per engine — after which reloads
    take seconds. The topology build path remains useful as hermetic
    compile falsification."""
    import pickle
    from jax.experimental import serialize_executable as se
    with open(path, "rb") as f:
        d = pickle.load(f)
    return se.deserialize_and_load(d["payload"], d["in_tree"],
                                   d["out_tree"])


def measure_latency(compiled, params, inputs, iters: int = 100):
    """p50/p99 single-dispatch latency + pipelined throughput.

    Syncs with device->host transfers: block_until_ready does not block
    through remote-device tunnels (see utils/profiling.py)."""
    from ..utils.profiling import force_sync
    force_sync(compiled(params, *inputs))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(compiled(params, *inputs))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        compiled(params, *inputs)
    force_sync(compiled(params, *inputs))
    thr = iters / (time.perf_counter() - t0)
    return {"p50_ms": float(np.percentile(lat_ms, 50)),
            "p99_ms": float(np.percentile(lat_ms, 99)),
            "slots_per_s": float(thr)}
