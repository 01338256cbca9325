"""ctypes bindings for the native C++ tile loader (``native/tileloader.cc``).

Builds the shared library on first use with g++ (cached beside the source); every entry
point degrades gracefully to the PIL path when the toolchain or library is unavailable, so
the framework never hard-depends on native code being buildable.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "tileloader.cc"
_SO = _SRC.with_suffix(".so")
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO), "-lz", "-lpthread"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.tl_load_batch.restype = ctypes.c_int
        lib.tl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.tl_decode_png.restype = ctypes.c_int
        lib.tl_decode_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def load_batch_native(
    paths: list[str], size: int, mode: str, n_threads: int = 0
) -> np.ndarray | None:
    """Batch-load PNGs → float32 [N,size,size,3]. ``mode``: 'seg' (NEAREST,[0,1]) or
    'gt' (BILINEAR,[−1,1]). Returns None if the native path is unavailable or any file
    failed (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    if any(not str(p).endswith(".png") for p in paths):
        return None
    out = np.empty((len(paths), size, size, 3), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    failed = lib.tl_load_batch(
        arr,
        len(paths),
        size,
        0 if mode == "seg" else 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if failed:
        return None
    return out


def decode_png_native(path: str, max_side: int = 8192) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty((max_side, max_side, 3), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.tl_decode_png(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_side,
        max_side,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
