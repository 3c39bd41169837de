"""ctypes binding for the native TIFF strip decoders (native/fasttiff.cpp).

LZW and PackBits decode at memory speed (the pure-Python LZW loop is
< 1 MB/s on literal-heavy streams — an hour-class wait for a production
657³ scan). Falls back silently when the shared library hasn't been
built; `io/tiff.py::_decompress` treats any failure here as "use the
Python decoder". Build with ``native/build.sh``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_FAILED = False


def _load_lib():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libptvtiff.so")
    try:
        lib = ctypes.CDLL(path)
        for fn in (lib.ptv_lzw_decode, lib.ptv_packbits_decode):
            fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                           ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
            fn.restype = ctypes.c_long
        _LIB = lib
    except OSError:
        _FAILED = True
        _LIB = None
    return _LIB


def _run(fn_name: str, data: bytes, expected: int) -> bytes | None:
    """Run a native decoder; None → caller falls back to Python.
    ``expected`` is the decoded strip size upper bound (rows × row
    bytes from the IFD); the buffer grows once if a nonconforming file
    under-declares it."""
    lib = _load_lib()
    if lib is None:
        return None
    fn = getattr(lib, fn_name)
    src = np.frombuffer(data, np.uint8)
    src_p = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    cap = max(int(expected), 1)
    for _ in range(2):
        dst = np.empty(cap, np.uint8)
        n = fn(src_p, len(src),
               dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n == -2:          # capacity short (file lied about strip size)
            cap *= 4
            continue
        if n < 0:
            return None      # corrupt per native parser: Python decides
        return dst[:n].tobytes()
    return None


def lzw_decode(data: bytes, expected: int) -> bytes | None:
    return _run("ptv_lzw_decode", data, expected)


def packbits_decode(data: bytes, expected: int) -> bytes | None:
    return _run("ptv_packbits_decode", data, expected)
