"""ctypes binding for the C++ host-side data pipeline (src/nesvor_native.cpp).

The library is auto-built with g++ on first use (``make -C nesvor_tpu/native``
does the same); every entry point returns None when the native library is
unavailable and callers fall back to the numpy implementation — results are
bit-identical either way (same f32 expression order).

Set ``NESVOR_TPU_NO_NATIVE=1`` to force the numpy paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "nesvor_native.cpp")
_SO = os.path.join(_DIR, "libnesvor_native.so")

_lock = threading.Lock()
_lib_cache: Optional[object] = None
_lib_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-lz", "-pthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logging.debug("native build failed to run: %s", e)
        return False
    if r.returncode != 0:
        logging.debug("native build failed:\n%s", r.stderr.decode()[:2000])
        return False
    return True


def get_lib():
    """The loaded CDLL, building it if needed; None if unavailable."""
    global _lib_cache, _lib_tried
    if _lib_cache is not None:
        return _lib_cache
    with _lock:
        if _lib_cache is not None or _lib_tried:
            return _lib_cache
        _lib_tried = True
        if os.environ.get("NESVOR_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logging.debug("native load failed: %s", e)
            return None
        lib.nsv_read_file.restype = ctypes.c_int64
        lib.nsv_read_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.nsv_free.argtypes = [ctypes.c_void_p]
        lib.nsv_cast_f32.restype = ctypes.c_int
        lib.nsv_cast_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
        ]
        lib.nsv_pixel_bag.restype = ctypes.c_int64
        lib.nsv_pixel_bag.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib_cache = lib
        return lib


def read_file(path: str) -> Optional[bytes]:
    """Whole-file read with transparent gzip inflate (zlib)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.nsv_read_file(path.encode(), ctypes.byref(buf))
    if n < 0:
        return None
    try:
        return ctypes.string_at(buf, n)
    finally:
        lib.nsv_free(buf)


def cast_f32(
    raw: bytes, offset: int, dtype_code: int, count: int, slope: float, inter: float
) -> Optional[np.ndarray]:
    """Multithreaded NIfTI payload cast (+ scl scaling) to float32."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, np.float32)
    src = (ctypes.c_uint8 * (len(raw) - offset)).from_buffer_copy(raw, offset)
    rc = lib.nsv_cast_f32(
        src, dtype_code, count, ctypes.c_float(slope), ctypes.c_float(inter),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None


def pixel_bag(
    img: np.ndarray, mask: np.ndarray, res: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused masked pixel extraction over a C-order (n, h, w) volume:
    returns (xyz (m,3) centered world-mm coords, v (m,)) in numpy nonzero
    order (reference Dataset semantics, nesvor/nesvor/train.py:19-41)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[None]
    mask8 = np.ascontiguousarray(mask, np.uint8).reshape(img.shape)
    n, h, w = img.shape
    res3 = np.ascontiguousarray(res, np.float32)
    m = lib.nsv_pixel_bag(
        img.ctypes.data_as(ctypes.c_void_p),
        mask8.ctypes.data_as(ctypes.c_void_p),
        n, h, w, res3.ctypes.data_as(ctypes.c_void_p), None, None,
    )
    xyz = np.empty((m, 3), np.float32)
    v = np.empty(m, np.float32)
    lib.nsv_pixel_bag(
        img.ctypes.data_as(ctypes.c_void_p),
        mask8.ctypes.data_as(ctypes.c_void_p),
        n, h, w, res3.ctypes.data_as(ctypes.c_void_p),
        xyz.ctypes.data_as(ctypes.c_void_p), v.ctypes.data_as(ctypes.c_void_p),
    )
    return xyz, v
