"""On-chip A/B: tiled layered-LDPC kernel (tile=8) vs per-codeword
(tile=1) vs the flooding one-hot decoder, at the eval transport block.

Usage: python scripts/bench_ldpc_tile.py [--batch 30] [--tiles 1 4 8]
Prints serialized device ms per decode call (chained, no pipelining).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--tiles", type=int, nargs="*", default=[1, 4, 8, 16])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from neural_rx_tpu.phy.nr.ldpc import get_code, decode as flood_decode
    from neural_rx_tpu.kernels.ldpc_pallas import make_decoder
    from neural_rx_tpu.utils.profiling import chained_device_time_ms

    code = get_code(1, 384)  # 132-PRB eval TB codeblock
    rng = np.random.default_rng(0)
    llr = jnp.asarray(
        rng.normal(size=(args.batch, code.n_full)).astype(np.float32) * 2)

    results = {}
    for tile in args.tiles:
        dec = make_decoder(code, num_iter=20, tile=tile)
        ms = chained_device_time_ms(
            lambda x: dec(x).sum(-1), llr, length=10, reps=3)
        results[f"tile{tile}"] = round(ms, 3)
        print(f"tile={tile}: {ms:.3f} ms/call "
              f"({args.batch / ms * 1e3:.0f} cw/s)", flush=True)

    fl = jax.jit(lambda x: flood_decode(code, x, num_iter=20).sum(-1))
    ms = chained_device_time_ms(lambda x: fl(x), llr, length=5, reps=3)
    results["flooding"] = round(ms, 3)
    print(f"flooding: {ms:.3f} ms/call", flush=True)
    import json
    print(json.dumps({"metric": "ldpc_decode_ms_batch%d" % args.batch,
                      "results": results}))


if __name__ == "__main__":
    main()
