"""ctypes binding for the native GF(2) LDPC oracle encoder.

An algorithmically independent encoder (generic bitset Gaussian
elimination on the lifted 4Z x 4Z core system — no special-column /
staircase assumptions) used by tests to cross-validate the structured
JAX encoder in `ldpc.py` under whatever shift table is live (generated
fallback or loaded 38.212 CSVs). Built with g++ on first use, same
pattern as channel/io_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "native", "ldpc_oracle.cc")
_SO = os.path.join(_DIR, "native", "libldpcoracle.so")
_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.ldpc_encode_oracle.restype = ctypes.c_int
    lib.ldpc_encode_oracle.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, i32p, i32p, u8p, u8p]
    _lib = lib
    return lib


def encode_oracle(code, info: np.ndarray) -> np.ndarray:
    """Encode one info vector [K] (0/1) -> codeword [num_cols * Z] via
    the native generic solver. `code` is an `ldpc.LDPCCode`."""
    lib = _get_lib()
    info = np.ascontiguousarray(np.asarray(info) % 2, np.uint8)
    assert info.shape == (code.k,)
    out = np.zeros(code.n_full, np.uint8)
    ret = lib.ldpc_encode_oracle(
        code.num_rows, code.num_cols, code.k_b, code.z, code.num_edges,
        np.ascontiguousarray(code.edge_row, np.int32),
        np.ascontiguousarray(code.edge_col, np.int32),
        np.ascontiguousarray(code.edge_shift, np.int32), info, out)
    if ret != 0:
        raise RuntimeError(f"oracle encoder failed with code {ret}")
    return out
