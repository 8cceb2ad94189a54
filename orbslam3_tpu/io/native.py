"""ctypes bindings to the native C++ data-loader (native/dataloader.cpp).

Provides PNG grayscale decode, IMU CSV parsing, and a threaded image
prefetcher. Falls back to PIL/python when the shared library has not been
built (`make -C native` or the g++ one-liner in native/dataloader.cpp).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "liborbslam3_io.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.png_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.png_info.restype = ctypes.c_int
        lib.png_decode_gray.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.png_decode_gray.restype = ctypes.c_int
        lib.imu_csv_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.imu_csv_parse.restype = ctypes.c_long
        lib.prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_get.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)]
        lib.prefetcher_get.restype = ctypes.c_int
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def png_decode_gray(path: str) -> np.ndarray:
    """Decode a PNG into (H, W) uint8 grayscale via the native decoder."""
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_info(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"png_info({path}) failed: {rc}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.png_decode_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size
    )
    if rc != 0:
        raise IOError(f"png_decode_gray({path}) failed: {rc}")
    return out


def imu_csv_parse(path: str, cap: int = 2_000_000):
    """Parse an EuRoC imu0/data.csv natively -> (ts_ns, gyro, acc)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    ts = np.empty(cap, np.int64)
    gyro = np.empty((cap, 3), np.float32)
    acc = np.empty((cap, 3), np.float32)
    n = lib.imu_csv_parse(
        path.encode(),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gyro.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        acc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
    )
    if n < 0:
        raise IOError(f"imu_csv_parse({path}) failed: {n}")
    return ts[:n].copy(), gyro[:n].copy(), acc[:n].copy()


class ImagePrefetcher:
    """Threaded PNG prefetcher: decode frames ahead of the SLAM loop."""

    def __init__(self, paths: list[str], width: int, height: int, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self.width = width
        self.height = height
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._h = lib.prefetcher_create(arr, len(paths), width, height, threads)
        self._n = len(paths)

    def get(self, index: int) -> np.ndarray:
        out = np.empty((self.height, self.width), np.uint8)
        rc = self._lib.prefetcher_get(
            self._h, index, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc == 1:
            # decode failure: native side zero-filled the buffer; surface
            # it rather than silently feeding black frames to the tracker
            raise IOError(f"prefetcher_get({index}): PNG decode failed")
        if rc != 0:
            raise IOError(f"prefetcher_get({index}) failed: {rc}")
        return out

    def close(self):
        if self._h:
            self._lib.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
