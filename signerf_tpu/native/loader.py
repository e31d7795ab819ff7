"""ctypes binding for the native image codec (native/image_codec.cpp).

Builds the shared library on first use (g++ + zlib, both baked into the
image) and caches it next to the source. Every entry point has a PIL
fallback so the package works without a toolchain; the native path is the
default because batch decode happens GIL-free in C++ threads (SURVEY.md
§2b "Parallel ray-batch producer" — replaces the reference's pathos worker
processes with in-process native threads).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libimage_codec.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_NATIVE_DIR / "image_codec.cpp").stat().st_mtime
            ):
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.decode_png_batch.restype = ctypes.c_int
            lib.decode_png_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.png_dims.restype = ctypes.c_int
            lib.png_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.encode_png.restype = ctypes.c_int
            lib.encode_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception as exc:  # toolchain missing / build error
            print(f"[native] image codec unavailable ({exc}); using PIL")
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def png_dims(path: str | Path) -> Optional[Tuple[int, int]]:
    """(width, height) from the IHDR without decoding; None on failure."""
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.png_dims(str(path).encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_png_batch(
    paths: Sequence[str | Path],
    width: int,
    height: int,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode+resize a batch of PNGs -> [N, H, W, 3] uint8.

    Returns None if the native library is unavailable or any file is not a
    decodable PNG (caller falls back to PIL).
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    errors = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.decode_png_batch(
        arr,
        n,
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        errors,
        num_threads,
    )
    if failures:
        return None
    return out


def encode_png(
    array: np.ndarray, path: str | Path, compress_level: int = 1
) -> bool:
    """Write a uint8 [H, W] / [H, W, 1] (gray) or [H, W, 3] (RGB) array as
    a PNG. Returns False if the native library is unavailable or encoding
    fails (caller falls back to PIL). ctypes releases the GIL for the
    duration, so writer-pool threads encode concurrently."""
    lib = _get_lib()
    if lib is None:
        return False
    a = np.asarray(array)
    if a.dtype != np.uint8:  # caller owns the [0,1]->255 conversion
        return False
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    if a.ndim == 2:
        channels = 1
    elif a.ndim == 3 and a.shape[-1] == 3:
        channels = 3
    else:
        return False
    a = np.ascontiguousarray(a)
    h, w = a.shape[:2]
    rc = lib.encode_png(
        str(path).encode(),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(w),
        int(h),
        channels,
        int(compress_level),
    )
    return rc == 0
