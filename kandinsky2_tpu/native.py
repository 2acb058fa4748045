"""ctypes bindings for the C++ host-ops library (native/hostops.cpp), with
transparent numpy fallbacks.

The library is built lazily on first import (``make -C native``); if the
toolchain or .so is unavailable everything silently falls back to numpy, so
the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO = os.path.join(_NATIVE_DIR, "libhostops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.f32_to_u8_images.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.u8_to_f32_images.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.erode_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def f32_to_u8_images(batch: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 (reference utils.py:57-66 semantics)."""
    lib = _load()
    arr = np.ascontiguousarray(batch, np.float32)
    if lib:
        out = np.empty(arr.shape, np.uint8)
        lib.f32_to_u8_images(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(arr.size),
        )
        return out
    return np.clip(np.rint((arr + 1) * 127.5), 0, 255).astype(np.uint8)


def u8_to_f32_images(batch: np.ndarray) -> np.ndarray:
    lib = _load()
    arr = np.ascontiguousarray(batch, np.uint8)
    if lib:
        out = np.empty(arr.shape, np.float32)
        lib.u8_to_f32_images(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(arr.size),
        )
        return out
    return arr.astype(np.float32) / 127.5 - 1.0


def erode_mask(mask_hw: np.ndarray) -> np.ndarray:
    """6-neighborhood keep-mask erosion (reference utils.py:11-30)."""
    lib = _load()
    arr = np.ascontiguousarray(mask_hw, np.float32)
    if lib:
        out = np.empty(arr.shape, np.float32)
        lib.erode_mask(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(arr.shape[0]), ctypes.c_int(arr.shape[1]),
        )
        return out
    from .utils import prepare_mask

    return prepare_mask(arr)
