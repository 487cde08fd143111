"""ctypes bindings for the dvnative C++ library (native/dvnative.cc).

Builds lazily with `make -C native` if the .so is missing; all callers fall
back to pure-Python paths when the native library can't be loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_SO_PATH = os.path.join(os.path.dirname(__file__), "_dvnative.so")
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO_PATH):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.dv_crc32c.restype = ctypes.c_uint32
    lib.dv_crc32c.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32,
    ]
    lib.dv_bgzf_inflate_all.restype = ctypes.c_int64
    lib.dv_bgzf_inflate_all.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    return lib


_LIB = _load()


def crc32c(data: bytes, crc: int = 0) -> int:
    return _LIB.dv_crc32c(data, len(data), crc)


def bgzf_decompress_all(raw: bytes) -> bytes:
    import numpy as np

    # First pass: compute total uncompressed size from ISIZE fields.
    size = _LIB.dv_bgzf_inflate_all(raw, len(raw), None, 0)
    if size < 0:
        raise ValueError("invalid BGZF stream")
    out = np.empty(size, dtype=np.uint8)
    got = _LIB.dv_bgzf_inflate_all(
        raw, len(raw), out.ctypes.data_as(ctypes.c_void_p), size
    )
    if got != size:
        raise ValueError("BGZF inflate failed")
    return out.tobytes()
