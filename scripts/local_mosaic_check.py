"""Compile pallas kernels for TPU v5e LOCALLY (no chip, no tunnel).

Round-3 discovery: the image's libtpu can create a compile-only PJRT
topology client (`jax.experimental.topologies.get_topology_desc(
"v5e:1x1x1", "tpu", chips_per_host_bounds=(1,1,1))`), so Mosaic
lowering — the thing interpret-mode tests can't falsify and that
previously burned chip windows via scripts/tpu_compile_smoke.py — can
be checked offline in seconds, with FULL error bodies.

Usage: python scripts/local_mosaic_check.py [name ...]
       (default: every check; names match substrings)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    # force real Mosaic lowering for kernels whose interpret arg is
    # None (entry()'s full-surface check): default_backend() is "cpu"
    # under the topology client, which would silently interpret-lower
    os.environ["NRX_FORCE_MOSAIC"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    sh = SingleDeviceSharding(topo.devices[0])

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    filters = sys.argv[1:]

    def check(name, fn, *args):
        if filters and not any(f in name for f in filters):
            return True
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"OK   {name}  ({time.time() - t0:.1f}s)", flush=True)
            return True
        except Exception as e:  # print the FULL error - that's the point
            print(f"FAIL {name}: {type(e).__name__}:\n{e}\n", flush=True)
            return False

    from neural_rx_tpu.kernels.sepconv_pallas import (
        fused_conv_stack, fused_conv_stack_blocked)
    from neural_rx_tpu.kernels.cgnn_iter_pallas import fused_iteration

    rng = np.random.default_rng(0)

    def sep_params(c_in, widths):
        layers = []
        cin = c_in
        for w in widths:
            layers.append({
                "dw": jnp.asarray(rng.normal(size=(3, 3, 1, cin)),
                                  jnp.bfloat16),
                "pw": jnp.asarray(rng.normal(size=(cin, w)), jnp.bfloat16),
                "b": jnp.zeros((w,), jnp.bfloat16)})
            cin = w
        return {"hidden": layers[:-1], "out": layers[-1]}

    ok = True
    p_init = sep_params(18, [128, 128])
    ok &= check("fused_conv_stack whole 18ch@132PRB",
                lambda x: fused_conv_stack(p_init, x, interpret=False),
                sds((2, 14, 1584, 18), jnp.bfloat16))
    p_upd = sep_params(130, [128, 128])
    ok &= check("fused blocked 130ch w_blk=256",
                lambda x: fused_conv_stack_blocked(p_upd, x, w_blk=256,
                                                   interpret=False),
                sds((2, 14, 1584, 130), jnp.bfloat16))

    d_s = 56
    it_p = {"agg": {"hidden": [{"w": jnp.asarray(
                        rng.normal(size=(d_s, 64)), jnp.bfloat16),
                    "b": jnp.zeros((64,), jnp.bfloat16)}],
                    "out": {"w": jnp.asarray(
                        rng.normal(size=(64, d_s)), jnp.bfloat16),
                            "b": jnp.zeros((d_s,), jnp.bfloat16)}},
            "update": sep_params(2 * d_s + 2, [128, 128, d_s])}
    ok &= check("fused_iteration T=2 d_s=56 w_blk=128",
                lambda s, pe, act: fused_iteration(
                    it_p, s, pe, act, w_blk=128, interpret=False),
                sds((1, 2, 14, 1584, d_s), jnp.bfloat16),
                sds((2, 14, 1584, 2), jnp.bfloat16),
                sds((1, 2), jnp.float32))
    ro_p = {"hidden": [{"w": jnp.asarray(rng.normal(size=(d_s, 128)),
                                         jnp.bfloat16),
                        "b": jnp.zeros((128,), jnp.bfloat16)}],
            "out": {"w": jnp.asarray(rng.normal(size=(128, 4)),
                                     jnp.bfloat16),
                    "b": jnp.zeros((4,), jnp.bfloat16)}}
    ok &= check("fused_iteration + readout",
                lambda s, pe, act: fused_iteration(
                    it_p, s, pe, act, w_blk=128, interpret=False,
                    readout_p=ro_p),
                sds((1, 2, 14, 1584, d_s), jnp.bfloat16),
                sds((2, 14, 1584, 2), jnp.bfloat16),
                sds((1, 2), jnp.float32))

    def check_entry():
        # the full deployed surface bench.py times (incl. the dense-LS
        # prep path): catches any XLA/Mosaic lowering break before the
        # round-end chip bench
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        sargs = jax.tree.map(
            lambda a: sds(a.shape, a.dtype), args)
        return check("deployed entry() full surface",
                     lambda *a: fn(*a), *sargs)

    ok &= check_entry()

    print("LOCAL MOSAIC " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
