"""ctypes binding for the native .cirbin CIR dataset reader.

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the binding is a plain C ABI + ctypes). Falls back to a pure
NumPy reader if compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "native", "cir_reader.cc")
_SO = os.path.join(_DIR, "native", "libcirreader.so")
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.cir_open.restype = ctypes.c_void_p
    lib.cir_open.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_uint32)]
    lib.cir_a_ptr.restype = ctypes.POINTER(ctypes.c_float)
    lib.cir_a_ptr.argtypes = [ctypes.c_void_p]
    lib.cir_tau_ptr.restype = ctypes.POINTER(ctypes.c_float)
    lib.cir_tau_ptr.argtypes = [ctypes.c_void_p]
    lib.cir_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_cirbin(path: str, a: np.ndarray, tau: np.ndarray):
    """a: [N, R, X, P] complex64; tau: [N, P] float32."""
    a = np.ascontiguousarray(a, np.complex64)
    tau = np.ascontiguousarray(tau, np.float32)
    n, r, x, p = a.shape
    assert tau.shape == (n, p)
    with open(path, "wb") as f:
        f.write(b"CIR1")
        f.write(np.asarray([n, r, x, p], np.uint32).tobytes())
        f.write(a.view(np.float32).tobytes())
        f.write(tau.tobytes())


def read_cirbin(path: str):
    """-> (a [N,R,X,P] complex64, tau [N,P] float32); mmap-backed."""
    try:
        lib = _get_lib()
    except (OSError, subprocess.CalledProcessError):
        return _read_cirbin_np(path)
    meta = (ctypes.c_uint32 * 4)()
    h = lib.cir_open(path.encode(), meta)
    if not h:
        raise IOError(f"cannot open CIR dataset {path}")
    n, r, x, p = (int(meta[i]) for i in range(4))
    a_count = n * r * x * p * 2
    a_buf = np.ctypeslib.as_array(lib.cir_a_ptr(h), shape=(a_count,))
    tau_buf = np.ctypeslib.as_array(lib.cir_tau_ptr(h), shape=(n * p,))
    # copy out so the handle can be closed (datasets fit in RAM, like
    # the reference's in-memory TFRecord load)
    a = a_buf.copy().view(np.complex64).reshape(n, r, x, p)
    tau = tau_buf.copy().reshape(n, p)
    lib.cir_close(h)
    return a, tau


def _read_cirbin_np(path: str):
    with open(path, "rb") as f:
        magic = f.read(4)
        assert magic == b"CIR1", "bad magic"
        n, r, x, p = np.frombuffer(f.read(16), np.uint32)
        a = np.frombuffer(f.read(int(n * r * x * p) * 8), np.complex64)
        tau = np.frombuffer(f.read(int(n * p) * 4), np.float32)
    return a.reshape(n, r, x, p).copy(), tau.reshape(n, p).copy()
