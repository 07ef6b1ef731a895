"""ctypes bindings for the native runtime (PNG codec, dataset ingest).

Builds lazily with make on first use; all callers fall back to the
PIL/numpy paths when the toolchain or build is unavailable, so the native
library is an accelerator, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libd2r_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.d2r_png_info_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.d2r_png_info_file.restype = ctypes.c_int
    lib.d2r_png_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_long,
    ]
    lib.d2r_png_decode_file.restype = ctypes.c_int
    lib.d2r_png_encode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.d2r_png_encode_file.restype = ctypes.c_long
    lib.d2r_load_rgbd_dataset.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.d2r_load_rgbd_dataset.restype = ctypes.c_int
    _lib = lib
    return _lib


def png_read(path: str) -> Optional[np.ndarray]:
    """Decode a PNG with the native codec. Returns None when unavailable.

    8-bit -> uint8 (H, W[, C]); 16-bit gray -> uint16 (H, W).
    """
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.d2r_png_info_file(path.encode(), w, h, ch, bd) != 0:
        return None
    dtype = np.uint16 if bd.value == 16 else np.uint8
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    out = np.empty(shape, dtype)
    rc = lib.d2r_png_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    return out if rc == 0 else None


def png_write(path: str, arr: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.uint16:
        bd, ch = 16, 1
        if arr.ndim != 2:
            return False
    elif arr.dtype == np.uint8:
        bd = 8
        ch = 1 if arr.ndim == 2 else arr.shape[2]
    else:
        return False
    rc = lib.d2r_png_encode_file(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
        arr.shape[1], arr.shape[0], ch, bd,
    )
    return rc > 0


def load_rgbd_dataset(dir_path: str, n: int, height: int, width: int):
    """Batch-ingest a scan directory. Returns (rgb u8 (N,H,W,3), depth f32
    metres (N,H,W)) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.empty((n, height, width, 3), np.uint8)
    depth = np.empty((n, height, width), np.float32)
    rc = lib.d2r_load_rgbd_dataset(
        dir_path.encode(), n, height, width,
        rgb.ctypes.data_as(ctypes.c_void_p),
        depth.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return rgb, depth
