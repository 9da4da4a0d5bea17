"""Generate bit-exact LDPC golden vectors -> tests/data/ldpc_golden.npz.

Pins the encoder output for the config matrix's (BG, Z) pairs (BG1/Z=384
for the 132-PRB eval TBs, BG2/Z=224 for the 4-PRB training TBs, BG2/Z=64
small case) so any table/encoder drift fails tests/test_transport_chain.py
::TestGoldenVectors.

Run this again after dropping the true 38.212 shift CSVs into
neural_rx_tpu/phy/nr/data/ (see ldpc_tables.py docstring); the regenerated
file then pins the spec-exact output, and `spec_tables` in the blob records
which source produced it so stale goldens are skipped, not failed.
"""

import pathlib
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from neural_rx_tpu.phy.nr import ldpc_tables
from neural_rx_tpu.phy.nr.ldpc import get_code, encode

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests/data/ldpc_golden.npz"


def main():
    blob = {"spec_tables": np.bool_(ldpc_tables.spec_tables_active())}
    rng = np.random.default_rng(38212)
    for bg, z in [(1, 384), (2, 224), (2, 64)]:
        code = get_code(bg, z)
        info = rng.integers(0, 2, (2, code.k)).astype(np.float32)
        cw = np.asarray(encode(code, jnp.asarray(info))).astype(np.int8)
        blob[f"info_bg{bg}_z{z}"] = info.astype(np.int8)
        blob[f"cw_bg{bg}_z{z}"] = cw
    np.savez_compressed(OUT, **blob)
    print(f"wrote {OUT} (spec_tables={bool(blob['spec_tables'])})")


if __name__ == "__main__":
    main()
