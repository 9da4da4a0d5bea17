"""Compile-smoke every Pallas kernel at its deployed shape on the real
TPU. Interpret-mode CPU tests validate semantics but NOT Mosaic lowering
(two real lowering failures slipped through in round 2: a zero-width
roll slice in the fused sepconv kernel and an illegal block shape in the
tiled LDPC decoder); this script exists so a 2-minute chip slot can
falsify lowering for everything at once.

Usage: python scripts/tpu_compile_smoke.py   (single TPU client!)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # force through tunnel
        print(f"OK   {name}  ({time.time() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 - report and continue
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    from neural_rx_tpu.kernels.sepconv_pallas import (
        fused_conv_stack, fused_conv_stack_blocked)
    from neural_rx_tpu.kernels.ldpc_pallas import make_decoder
    from neural_rx_tpu.phy.nr.ldpc import LDPCCode

    rng = np.random.default_rng(0)
    ok = True

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

    # fused sepconv, whole-grid route (init stack: 18 -> 64 -> 64)
    p_init = sep_params(18, [64, 64])
    x18 = jnp.asarray(rng.normal(size=(2, 14, 1584, 18)), jnp.bfloat16)
    ok &= check("fused_conv_stack whole 18ch@132PRB",
                lambda: fused_conv_stack(p_init, x18, interpret=False))
    ok &= check("fused_conv_stack whole masked",
                lambda: fused_conv_stack(p_init, x18, interpret=False,
                                         sc_valid=jnp.int32(1200)))

    # fused sepconv, W-blocked route (update stack: 130 -> 64 -> 64)
    p_upd = sep_params(130, [64, 64])
    x130 = jnp.asarray(rng.normal(size=(2, 14, 1584, 130)), jnp.bfloat16)
    ok &= check("fused blocked 130ch w_blk=256",
                lambda: fused_conv_stack_blocked(p_upd, x130, w_blk=256,
                                                 interpret=False))
    ok &= check("fused blocked 130ch w_blk=256 masked",
                lambda: fused_conv_stack_blocked(
                    p_upd, x130, w_blk=256, interpret=False,
                    sc_valid=jnp.asarray([0, 1200], jnp.int32)))

    # fused whole-iteration kernel (nrx_rt deployed shape: d_s=56,
    # agg 56->64->56, update 114->128->128->56, T=2, 132 PRB)
    from neural_rx_tpu.kernels.cgnn_iter_pallas import fused_iteration
    d_s = 56
    it_p = {"agg": {"hidden": [{"w": jnp.asarray(
                        rng.normal(size=(d_s, 64)), jnp.bfloat16),
                    "b": jnp.zeros((64,), jnp.bfloat16)}],
                    "out": {"w": jnp.asarray(
                        rng.normal(size=(64, d_s)), jnp.bfloat16),
                            "b": jnp.zeros((d_s,), jnp.bfloat16)}},
            "update": sep_params(2 * d_s + 2, [128, 128, d_s])}
    s = jnp.asarray(rng.normal(size=(1, 2, 14, 1584, d_s)), jnp.bfloat16)
    pe = jnp.asarray(rng.normal(size=(2, 14, 1584, 2)), jnp.bfloat16)
    act = jnp.ones((1, 2), jnp.float32)
    for w_blk in (128, 256):
        ok &= check(f"fused_iteration T=2 d_s=56 w_blk={w_blk}",
                    lambda w=w_blk: fused_iteration(
                        it_p, s, pe, act, w_blk=w, interpret=False))
    ok &= check("fused_iteration masked",
                lambda: fused_iteration(it_p, s, pe, act,
                                        sc_valid=jnp.int32(1200),
                                        w_blk=128, interpret=False))
    ro_p = {"hidden": [{"w": jnp.asarray(rng.normal(size=(d_s, 128)),
                                         jnp.bfloat16),
                        "b": jnp.zeros((128,), jnp.bfloat16)}],
            "out": {"w": jnp.asarray(rng.normal(size=(128, 4)),
                                     jnp.bfloat16),
                    "b": jnp.zeros((4,), jnp.bfloat16)}}
    ok &= check("fused_iteration + fused readout",
                lambda: fused_iteration(it_p, s, pe, act, w_blk=128,
                                        interpret=False, readout_p=ro_p))
    ok &= check("fused_iteration lp stencil",
                lambda: fused_iteration(it_p, s, pe, act, w_blk=128,
                                        interpret=False,
                                        lp_stencil=True))

    # MXU-folded separable conv (XLA-path experiments only; the fused
    # iteration rejects conv_mxu — measured slower in round 3)
    ok &= check("fused_conv_stack whole MXU",
                lambda: fused_conv_stack(p_init, x18, interpret=False,
                                         mxu=True))
    ok &= check("fused blocked MXU w_blk=256",
                lambda: fused_conv_stack_blocked(p_upd, x130, w_blk=256,
                                                 interpret=False,
                                                 mxu=True))

    # tiled layered LDPC, tile=1 (round-1 baseline) and tile=8
    code = LDPCCode(bg=1, z=384)
    llr = jnp.asarray(rng.normal(size=(30, code.num_cols * 384)),
                      jnp.float32)
    for tile in (1, 8):
        dec = make_decoder(code, num_iter=2, interpret=False, tile=tile)
        ok &= check(f"ldpc layered tile={tile} BG1/Z=384",
                    lambda d=dec: d(llr))

    # non-lane-multiple lifting (e2e configs: BG1/Z=352) - exercises the
    # two-rotate composed cyclic shift on real Mosaic
    code352 = LDPCCode(bg=1, z=352)
    llr352 = jnp.asarray(rng.normal(size=(8, code352.num_cols * 352)),
                         jnp.float32)
    dec352 = make_decoder(code352, num_iter=2, interpret=False)
    ok &= check("ldpc layered BG1/Z=352 (two-rotate shift)",
                lambda: dec352(llr352))

    # auto-tiled decode at the 64qam eval batch (the round-2 eval OOM'd
    # scoped VMEM with a hand-set tile: f32[32,68,384] stack alloc;
    # auto_tile must pick a tile that fits the 12 MB budget)
    dec_auto = make_decoder(code, num_iter=20, interpret=False)
    llr_b32 = jnp.asarray(rng.normal(size=(32, code.num_cols * 384)),
                          jnp.float32)
    ok &= check("ldpc layered auto-tile batch=32 BG1/Z=384 20it",
                lambda: dec_auto(llr_b32))

    print("SMOKE", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
