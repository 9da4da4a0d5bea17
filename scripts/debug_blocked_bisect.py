"""Bisect the Mosaic internal crash in the W-blocked sepconv kernel.

Each case adds one construct from _stack_kernel_blocked until the
tpu_compile_helper 500 reproduces. Run on the real chip.
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

H, W_BLK, HALO, N_WB, C = 14, 256, 3, 4, 130
W_EXT = W_BLK + 2 * HALO
W_PAD = N_WB * W_BLK


def run(name, kernel, n_scratch_c=C):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, H, W_PAD + 2 * HALO, C)), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, H, W_PAD, C),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, H, W_PAD, C), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((1, H, W_EXT, n_scratch_c), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x)
        np.asarray(out)
        print(f"OK   {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


def k_dma_store(x_hbm, out_ref, xbuf, sem):
    """DMA extended window in, dynamic-start store core back."""
    n = pl.program_id(0)

    def body(wb, _):
        cp = pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(wb * W_BLK, W_EXT), :],
            xbuf.at[0], sem.at[0])
        cp.start()
        cp.wait()
        out_ref[0, :, pl.ds(wb * W_BLK, W_BLK), :] = (
            xbuf[0, :, HALO:HALO + W_BLK, :])
        return _

    jax.lax.fori_loop(0, N_WB, body, None)


def k_plus_concat(x_hbm, out_ref, xbuf, sem):
    """+ concat-pad of the window (as _dw3x3 does)."""
    n = pl.program_id(0)

    def body(wb, _):
        cp = pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(wb * W_BLK, W_EXT), :],
            xbuf.at[0], sem.at[0])
        cp.start()
        cp.wait()
        xv = xbuf[0]
        zc = jnp.zeros((H, 1, C), xv.dtype)
        xp = jnp.concatenate([zc, xv, zc], axis=1)
        zr = jnp.zeros((1, W_EXT + 2, C), xv.dtype)
        xp = jnp.concatenate([zr, xp, zr], axis=0)
        sl = jax.lax.slice(xp, (2, 2, 0), (2 + H, 2 + W_EXT, C))
        out_ref[0, :, pl.ds(wb * W_BLK, W_BLK), :] = (
            sl[:, HALO:HALO + W_BLK, :].astype(out_ref.dtype))
        return _

    jax.lax.fori_loop(0, N_WB, body, None)


def k_plus_iota_dot(x_hbm, out_ref, xbuf, sem):
    """+ iota mask + reshape/dot (rest of _run_stack's op set)."""
    n = pl.program_id(0)
    pw = jnp.eye(C, dtype=jnp.bfloat16)

    def body(wb, _):
        cp = pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(wb * W_BLK, W_EXT), :],
            xbuf.at[0], sem.at[0])
        cp.start()
        cp.wait()
        col = (jax.lax.broadcasted_iota(jnp.int32, (1, W_EXT, 1), 1)
               + wb * W_BLK - HALO)
        xv = jnp.where((col >= 0) & (col < W_PAD), xbuf[0], 0)
        acc = xv.astype(jnp.float32)
        y = jax.lax.dot_general(
            acc.reshape(H * W_EXT, C), pw.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xv = y.reshape(H, W_EXT, C).astype(out_ref.dtype)
        out_ref[0, :, pl.ds(wb * W_BLK, W_BLK), :] = (
            xv[:, HALO:HALO + W_BLK, :])
        return _

    jax.lax.fori_loop(0, N_WB, body, None)


def main():
    run("dma+dynstore", k_dma_store)
    run("dma+concat+slice+dynstore", k_plus_concat)
    run("dma+iota+dot+dynstore", k_plus_iota_dot)


if __name__ == "__main__":
    main()
