"""ctypes bindings for the native blosc codec (native/blosc_codec.cpp).

Builds the shared library on first use (g++ + system libzstd) and caches
it next to the sources. All entry points degrade gracefully: if the
toolchain or libzstd is unavailable, `available()` is False and callers
fall back to gzip caches.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbflow_blosc.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.bflow_blosc_decompress.restype = ctypes.c_long
        lib.bflow_blosc_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.bflow_blosc_compress.restype = ctypes.c_long
        lib.bflow_blosc_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def decompress(payload: bytes, dst_nbytes: int) -> Optional[bytes]:
    lib = _get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(dst_nbytes)
    got = lib.bflow_blosc_decompress(
        payload, len(payload), out, dst_nbytes
    )
    if got < 0:
        return None
    return out.raw[:got]


def compress(arr: np.ndarray, clevel: int = 1) -> bytes:
    lib = _get_lib()
    assert lib is not None
    arr = np.ascontiguousarray(arr)
    n = arr.nbytes
    cap = n + 16 + 4 * (n // (256 * 1024) + 2) + 1024
    out = ctypes.create_string_buffer(cap)
    got = lib.bflow_blosc_compress(
        arr.ctypes.data_as(ctypes.c_void_p), n, out, cap,
        arr.dtype.itemsize, clevel,
    )
    assert got > 0, "blosc compression failed"
    return out.raw[:got]
