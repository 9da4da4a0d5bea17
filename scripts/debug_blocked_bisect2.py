"""Bisect round 2: isolate DMA-vs-store and alignment causes."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

H, W_BLK, HALO, N_WB = 14, 256, 3, 4
W_PAD = N_WB * W_BLK


def run(name, kernel, c, w_ext):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, H, W_PAD + 2 * HALO, c)), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, H, W_PAD, c),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, H, W_PAD, c), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((1, H, w_ext, c), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x)
        np.asarray(out)
        print(f"OK   {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


def make_kernel(c, w_ext, dyn_dma, dyn_store):
    def kernel(x_hbm, out_ref, xbuf, sem):
        n = pl.program_id(0)

        def body(wb, _):
            src_off = wb * W_BLK if dyn_dma else 0
            cp = pltpu.make_async_copy(
                x_hbm.at[n, :, pl.ds(src_off, w_ext), :],
                xbuf.at[0], sem.at[0])
            cp.start()
            cp.wait()
            dst_off = wb * W_BLK if dyn_store else 0
            out_ref[0, :, pl.ds(dst_off, W_BLK), :] = (
                xbuf[0, :, :W_BLK, :])
            return _

        jax.lax.fori_loop(0, N_WB, body, None)

    return kernel


def main():
    for c in (130, 128):
        for w_ext in (W_BLK + 2 * HALO, W_BLK):
            for dyn_dma in (False, True):
                for dyn_store in (False, True):
                    name = (f"c={c} w_ext={w_ext} "
                            f"dma={'dyn' if dyn_dma else 'st'} "
                            f"store={'dyn' if dyn_store else 'st'}")
                    run(name, make_kernel(c, w_ext, dyn_dma, dyn_store),
                        c, w_ext)


if __name__ == "__main__":
    main()
