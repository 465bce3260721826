"""Native (C++) runtime components, loaded via ctypes.

The reference's host-side hot paths are native C++; here the host hot path
is entropy coding, implemented in native/rans.cpp (RLE0 + order-0 rANS).
The shared library is built on first import with g++ (cached next to the
source); everything degrades gracefully to the pure-Python zlib backend when
no compiler is available (`native.available` is False then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rans.cpp")
_LIB = os.path.join(_DIR, "librbv_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # compiler missing / failed
        print(f"rabbit native build failed ({e}); using zlib fallback",
              file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.rbv_compress_i16.restype = ctypes.c_int64
    lib.rbv_compress_i16.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.rbv_decompress_i16.restype = ctypes.c_int64
    lib.rbv_decompress_i16.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def compress_i16(arr) -> bytes:
    """np.int16 array -> rANS blob (raises RuntimeError if native missing)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native entropy library unavailable")
    a = np.ascontiguousarray(arr, dtype=np.int16)
    cap = a.nbytes + 4096 + (a.nbytes >> 2)
    # np.empty, NOT ctypes.create_string_buffer: the latter zero-fills the
    # whole capacity (~20 MB memset per bench plane, measured ~half the
    # wrapper's total cost)
    out = np.empty(cap, np.uint8)
    n = lib.rbv_compress_i16(
        a.ctypes.data_as(ctypes.c_void_p), a.size,
        out.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if n < 0:
        raise RuntimeError("rbv_compress_i16 failed")
    return out[:n].tobytes()


def decompress_i16(blob: bytes, n_elements: int):
    """rANS blob -> np.int16 array of n_elements."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native entropy library unavailable")
    out = np.empty(n_elements, np.int16)
    consumed = lib.rbv_decompress_i16(
        blob, len(blob), out.ctypes.data_as(ctypes.c_void_p), n_elements
    )
    if consumed < 0:
        raise RuntimeError("rbv_decompress_i16 failed (corrupt stream?)")
    return out
