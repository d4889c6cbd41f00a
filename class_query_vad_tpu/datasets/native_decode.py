"""ctypes bindings for the native decode core (native/decode.cpp).

Builds ``native/libcqvad_decode.so`` on first use if missing (make), and
falls back to PIL transparently when the toolchain or libs are absent.
The native resampler is bit-exact with Pillow's BICUBIC (verified in
tests/test_native_decode.py), so datasets can swap it in without any
numerics drift.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcqvad_decode.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.cq_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cq_decode_resize.restype = ctypes.c_int
    lib.cq_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.cq_decode_batch.restype = ctypes.c_int
    lib.cq_resize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.cq_resize.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, out_w: int, out_h: int) -> Optional[np.ndarray]:
    """Decode one JPEG/PNG and bicubic-resize to (out_h, out_w) RGB uint8.
    Returns None if the native lib is unavailable or decode fails."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.cq_decode_resize(
        path.encode(), out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def decode_batch(paths: List[str], out_w: int, out_h: int,
                 n_threads: int = 8) -> Optional[np.ndarray]:
    """Threaded batch decode -> [N, out_h, out_w, 3] uint8 (None on failure)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.cq_decode_batch(
        arr, n, out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    return out if rc == 0 else None


def resize(img: np.ndarray, out_w: int, out_h: int) -> Optional[np.ndarray]:
    """Pillow-BICUBIC-compatible resize of an RGB uint8 array."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.cq_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
    )
    return out if rc == 0 else None
