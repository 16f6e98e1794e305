"""Native (C++) data-loader hot path, loaded over ctypes.

The compute path of this framework is JAX/XLA/Pallas; the input pipeline's
hot loop — JPEG decode + antialiased resize — is C++ (jpeg_loader.cc,
libjpeg + a Pillow-compatible triangle-filter resampler).  ctypes is used
instead of pybind11 (not in the image) and every entry point releases the
GIL for free, so the threaded PrefetchLoader scales across cores.

Build:  python -m lavt_rs_tpu.native.build   (or import — it autobuilds
once into this directory).  Everything falls back to PIL transparently if
g++ or libjpeg is unavailable; `available()` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libjpeg_loader.so")
_SRC = os.path.join(_DIR, "jpeg_loader.cc")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-march=native", _SRC,
           "-o", _SO, "-ljpeg"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        print(f"lavt_rs_tpu.native: build failed:\n{r.stderr}",
              file=sys.stderr)
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lavt_decode_resize_jpeg.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int, u8p]
        lib.lavt_decode_resize_jpeg.restype = ctypes.c_int
        lib.lavt_resize_rgb.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
        lib.lavt_resize_rgb.restype = ctypes.c_int
        lib.lavt_jpeg_dims.argtypes = [
            u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.lavt_jpeg_dims.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled loader is usable on this host."""
    return _load() is not None


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_resize_jpeg(data: bytes, out_h: int, out_w: int
                       ) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 (out_h, out_w, 3), decoded and resized in C++.

    Returns None when the native library is unavailable or the payload is
    not a decodable JPEG (caller falls back to PIL).
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.lavt_decode_resize_jpeg(_as_u8p(buf), len(data), out_h, out_w,
                                     _as_u8p(out))
    return out if rc == 0 else None


def resize_rgb(img: np.ndarray, out_h: int, out_w: int
               ) -> Optional[np.ndarray]:
    """uint8 HWC RGB -> (out_h, out_w, 3) with Pillow's BILINEAR filter."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.lavt_resize_rgb(_as_u8p(img), img.shape[0], img.shape[1],
                             out_h, out_w, _as_u8p(out))
    return out if rc == 0 else None


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(height, width) from the JPEG header, no full decode."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.lavt_jpeg_dims(_as_u8p(buf), len(data), ctypes.byref(h),
                            ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None
