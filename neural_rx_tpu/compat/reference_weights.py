"""Import reference (Keras get_weights) pickles into CGNN param pytrees.

The reference saves `model.get_weights()` — a flat list of arrays in
layer-creation order (reference utils/utils.py:34-50). For the CGNN that
order is: StateInit blocks (per MCS, or one shared for var-MCS masking),
then per iteration (aggregation MLP, update conv stack), then LLR
readouts (per MCS or shared), then the chest readout
(neural_rx.py:407-530 construction order).

Layout translations:
- Keras SeparableConv2D depthwise kernel [3, 3, C_in, 1] -> ours
  [3, 3, 1, C_in] (feature_group_count convention), PLUS an H<->W swap:
  the reference grid layout is [subcarrier, symbol] while ours is
  [symbol, subcarrier] (transpose (1, 0, 3, 2)).
- pointwise [1, 1, C_in, C_out] -> [C_in, C_out].
- Dense kernels/biases transfer unchanged (per-RE channel MLPs).
"""

from __future__ import annotations

import pickle

import numpy as np
import jax.numpy as jnp


class _Cursor:
    def __init__(self, arrays):
        self.arrays = [np.asarray(a) for a in arrays]
        self.i = 0

    def take(self, expect_shape=None):
        a = self.arrays[self.i]
        if expect_shape is not None:
            assert tuple(a.shape) == tuple(expect_shape), (
                f"weight {self.i}: shape {a.shape}, expected "
                f"{expect_shape}")
        self.i += 1
        return a


def _load_sepconv(cur, p):
    dw_ref = cur.take()  # [3,3,C,1]
    pw_ref = cur.take()  # [1,1,C,O]
    b_ref = cur.take()
    c = dw_ref.shape[2]
    o = pw_ref.shape[3]
    assert p["dw"].shape == (3, 3, 1, c), (p["dw"].shape, c)
    assert p["pw"].shape == (c, o)
    return {
        "dw": jnp.asarray(np.transpose(dw_ref, (1, 0, 3, 2))),
        "pw": jnp.asarray(pw_ref[0, 0]),
        "b": jnp.asarray(b_ref),
    }


def _load_dense(cur, p):
    w = cur.take(p["w"].shape)
    b = cur.take(p["b"].shape)
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def _load_conv_stack(cur, p):
    return {"hidden": [_load_sepconv(cur, lp) for lp in p["hidden"]],
            "out": _load_sepconv(cur, p["out"])}


def _load_mlp(cur, p):
    return {"hidden": [_load_dense(cur, lp) for lp in p["hidden"]],
            "out": _load_dense(cur, p["out"])}


def import_reference_weights(params: dict, weight_list) -> dict:
    """Map a reference get_weights() list onto a CGNN param pytree.

    params: output of `init_cgnn_params` (defines the architecture).
    Returns a new pytree of the same structure with imported values.
    """
    cur = _Cursor(weight_list)
    out = {}
    out["s_init"] = [_load_conv_stack(cur, p) for p in params["s_init"]]
    out["iterations"] = [
        {"agg": _load_mlp(cur, it["agg"]),
         "update": _load_conv_stack(cur, it["update"])}
        for it in params["iterations"]]
    out["readout_llrs"] = [_load_mlp(cur, p)
                           for p in params["readout_llrs"]]
    out["readout_chest"] = _load_mlp(cur, params["readout_chest"])
    assert cur.i == len(cur.arrays), (
        f"consumed {cur.i} of {len(cur.arrays)} reference arrays — "
        "architecture mismatch")
    return out


def load_reference_weights(path: str, params: dict) -> dict:
    """Load a reference weights pickle and map it onto `params`.

    e2e configs (custom_constellation=True) store the trainable
    constellation(s) first — the transmitters are created before the
    receiver (reference parameters.py:242-261), so Keras get_weights()
    lists their [2, 2^m] re/im point tensors ahead of the CGNN arrays."""
    with open(path, "rb") as f:
        wl = pickle.load(f)
    out = {}
    if "constellation" in params:
        n = len(params["constellation"])
        con = []
        for ref, ours in zip(wl[:n], params["constellation"]):
            ref = np.asarray(ref)
            assert ref.shape == tuple(np.shape(ours)), (
                f"constellation shape {ref.shape} != {np.shape(ours)}")
            con.append(jnp.asarray(ref))
        out["constellation"] = con
        wl = wl[n:]
    out["cgnn"] = import_reference_weights(params["cgnn"], wl)
    return out


# ---------------------------------------------------------------------------
# Export (framework -> reference format): the inverse mapping, so models
# trained here can be loaded by reference tooling (same 43-array layout)
# ---------------------------------------------------------------------------

def _dump_sepconv(p, out):
    out.append(np.transpose(np.asarray(p["dw"]), (1, 0, 3, 2)))
    out.append(np.asarray(p["pw"])[None, None])
    out.append(np.asarray(p["b"]))


def _dump_dense(p, out):
    out.append(np.asarray(p["w"]))
    out.append(np.asarray(p["b"]))


def _dump_conv_stack(p, out):
    for lp in p["hidden"]:
        _dump_sepconv(lp, out)
    _dump_sepconv(p["out"], out)


def _dump_mlp(p, out):
    for lp in p["hidden"]:
        _dump_dense(lp, out)
    _dump_dense(p["out"], out)


def export_reference_weights(params: dict) -> list:
    """CGNN param pytree -> reference-ordered get_weights() list.

    For e2e configs (trainable constellation) the constellation point
    tensors lead the list, matching Keras creation order (transmitters
    before receiver, reference parameters.py:242-261)."""
    cg = params["cgnn"] if "cgnn" in params else params
    out: list = []
    if isinstance(params, dict) and "constellation" in params:
        for c in params["constellation"]:
            out.append(np.asarray(c))
    for p in cg["s_init"]:
        _dump_conv_stack(p, out)
    for it in cg["iterations"]:
        _dump_mlp(it["agg"], out)
        _dump_conv_stack(it["update"], out)
    for p in cg["readout_llrs"]:
        _dump_mlp(p, out)
    _dump_mlp(cg["readout_chest"], out)
    return out


def save_reference_weights(path: str, params: dict):
    with open(path, "wb") as f:
        pickle.dump(export_reference_weights(params), f)
