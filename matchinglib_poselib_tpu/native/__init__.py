"""ctypes binding for the native C++ data loader (loader.cpp).

Builds ``libmlploader.so`` on first use (g++ -O2 -shared -fPIC -lz) and
caches it next to the source. Every entry point degrades gracefully: if
the toolchain or zlib is missing, or a file uses an unsupported encoding
(e.g. interlaced PNG), callers fall back to the PIL path in utils/io.py.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libmlploader.so"
_SRC = _DIR / "loader.cpp"

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    [
                        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                        str(_SRC), "-lz", "-o", str(_SO),
                    ],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_SO))
            lib.mlp_load_gray.restype = ctypes.c_void_p
            lib.mlp_load_gray.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mlp_data.restype = ctypes.POINTER(ctypes.c_float)
            lib.mlp_data.argtypes = [ctypes.c_void_p]
            lib.mlp_release.argtypes = [ctypes.c_void_p]
            lib.mlp_load_batch_gray.restype = ctypes.c_int
            lib.mlp_load_batch_gray.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            _lib = lib
            return _lib
        except Exception:
            _build_failed = True
            return None


def available() -> bool:
    return _load() is not None


def load_image_gray(path) -> np.ndarray | None:
    """(H, W) float32 grayscale in [0, 1], or None if undecodable here."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    handle = lib.mlp_load_gray(
        str(path).encode(), ctypes.byref(h), ctypes.byref(w)
    )
    if not handle:
        return None
    try:
        buf = np.ctypeslib.as_array(
            lib.mlp_data(handle), shape=(h.value, w.value)
        )
        return np.array(buf, dtype=np.float32)  # own copy before release
    finally:
        lib.mlp_release(handle)


def load_batch_gray(paths, h: int, w: int, n_threads: int = 0):
    """Threaded batch decode into one (N, H, W) float32 array.

    Returns (array, n_decoded); slots that failed to decode (or whose
    size differs from (h, w)) are zero-filled — callers treat n_decoded
    < N as a signal to fall back per-file.
    """
    lib = _load()
    if lib is None:
        return None, 0
    n = len(paths)
    out = np.empty((n, h, w), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    good = lib.mlp_load_batch_gray(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, n_threads,
    )
    return out, int(good)
