"""ctypes bindings for the native frame-ingestion runtime (native/framesrc.cpp).

The compute path is JAX/XLA; the host-side frame pipeline (grayscale
conversion, synthetic generation, PPM decode) is C++ for throughput, loaded
here via ctypes with transparent NumPy fallbacks, so the framework works
whether or not the .so has been built (``make -C native``).  ``available()``
reports which path is active; every wrapper returns identical results either
way (the native grayscale ops are bit-exact twins of the oracle).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "available",
    "build",
    "gray_f32",
    "gray_u8",
    "synthetic_frame",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libof2native.so")

_lib: ctypes.CDLL | None = None
_load_attempted = False


def _try_load() -> ctypes.CDLL | None:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.of2_gray_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
        lib.of2_gray_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
        lib.of2_u8_to_f32.argtypes = [u8p, ctypes.c_int64, f32p]
        lib.of2_synthetic_frame.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            u8p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def build(quiet: bool = True) -> bool:
    """Build the native library in place (requires g++/make); returns success."""
    global _load_attempted
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _load_attempted = False
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def gray_f32(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) float32 channel mean (production ingestion)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    lib = _try_load()
    if lib is None:
        s = rgb.astype(np.float32)
        return (s[..., 0] + s[..., 1] + s[..., 2]) * np.float32(1.0 / 3.0)
    out = np.empty((h, w), np.float32)
    lib.of2_gray_f32(_u8p(rgb), h, w, _f32p(out))
    return out


def gray_u8(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) uint8, exact integer (r+g+b)/3 (oracle twin)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    lib = _try_load()
    if lib is None:
        s = rgb.astype(np.int32)
        return ((s[..., 0] + s[..., 1] + s[..., 2]) // 3).astype(np.uint8)
    out = np.empty((h, w), np.uint8)
    lib.of2_gray_u8(_u8p(rgb), h, w, _u8p(out))
    return out


def synthetic_frame(
    t: int, h: int, w: int, vx: float, vy: float, period: int = 16
) -> np.ndarray:
    """Noise-free synthetic translating-texture frame (utils.io twin)."""
    lib = _try_load()
    if lib is None:
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        sx, sy = xs - vx * t, ys - vy * t
        img = (
            127.0
            + 55.0 * np.sin(2 * np.pi * sx / period) * np.sin(2 * np.pi * sy / period)
            + 35.0 * np.sin(2 * np.pi * (sx + sy) / (period * 2.7))
        )
        return np.clip(img, 0, 255).astype(np.uint8)
    out = np.empty((h, w), np.uint8)
    lib.of2_synthetic_frame(t, h, w, float(vx), float(vy), period, _u8p(out))
    return out
