"""ctypes bindings for the native transform core (transform.cpp).

Compiled lazily with g++ on first use and cached next to the source;
every entry point has a NumPy fallback so environments without a
toolchain degrade gracefully (``native_available()`` reports which path
is active). Semantics are pinned to the JAX ops by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "transform.cpp")
_LIB_PATH = os.path.join(_DIR, "libseghiero_transform.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC
    ):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.resize_bilinear_u8.argtypes = [u8p, c, c, c, u8p, c, c]
    lib.resize_nearest_i32.argtypes = [i32p, c, c, i32p, c, c]
    lib.hflip_u8.argtypes = [u8p, c, c, c, u8p]
    lib.hflip_i32.argtypes = [i32p, c, c, i32p]
    lib.lut_remap_i32.argtypes = [
        i32p,
        ctypes.c_int64,
        i32p,
        c,
        ctypes.c_int32,
        i32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Public ops (native with NumPy fallback)
# ---------------------------------------------------------------------------


def resize_bilinear_u8(img: np.ndarray, size) -> np.ndarray:
    """uint8 HWC bilinear resize, half-pixel convention (no antialias).

    NOTE: this is the torch/jax convention, NOT PIL's area-filtered
    BILINEAR — use JointTransform's PIL path for bit-parity with the
    reference preprocessing; this is the high-throughput native variant.
    """
    h, w = size
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty((h, w, img.shape[2]), np.uint8)
        lib.resize_bilinear_u8(img, img.shape[0], img.shape[1], img.shape[2], out, h, w)
        return out
    # NumPy fallback (vectorized half-pixel bilinear)
    sh, sw, _ = img.shape
    fy = (np.arange(h) + 0.5) * sh / h - 0.5
    fx = (np.arange(w) + 0.5) * sw / w - 0.5
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    ty = (fy - y0)[:, None, None]
    tx = (fx - x0)[None, :, None]
    y0c, y1c = np.clip(y0, 0, sh - 1), np.clip(y0 + 1, 0, sh - 1)
    x0c, x1c = np.clip(x0, 0, sw - 1), np.clip(x0 + 1, 0, sw - 1)
    f = img.astype(np.float32)
    v = (1 - ty) * ((1 - tx) * f[y0c][:, x0c] + tx * f[y0c][:, x1c]) + ty * (
        (1 - tx) * f[y1c][:, x0c] + tx * f[y1c][:, x1c]
    )
    return np.clip(np.round(v), 0, 255).astype(np.uint8)


def resize_nearest_i32(mask: np.ndarray, size) -> np.ndarray:
    h, w = size
    mask = np.ascontiguousarray(mask, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.int32)
        lib.resize_nearest_i32(mask, mask.shape[0], mask.shape[1], out, h, w)
        return out
    ys = (np.arange(h) * mask.shape[0]) // h
    xs = (np.arange(w) * mask.shape[1]) // w
    return mask[ys[:, None], xs[None, :]]


def hflip_u8(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty_like(img)
        lib.hflip_u8(img, img.shape[0], img.shape[1], img.shape[2], out)
        return out
    return np.ascontiguousarray(img[:, ::-1])


def hflip_i32(mask: np.ndarray) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty_like(mask)
        lib.hflip_i32(mask, mask.shape[0], mask.shape[1], out)
        return out
    return np.ascontiguousarray(mask[:, ::-1])


def lut_remap_i32(mask: np.ndarray, lut: np.ndarray, ignore: int = 255) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.int32)
    lut = np.ascontiguousarray(lut, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty_like(mask)
        lib.lut_remap_i32(mask.reshape(-1), mask.size, lut, len(lut), ignore, out.reshape(-1))
        return out
    valid = (mask >= 0) & (mask < len(lut))
    return np.where(valid, lut[np.clip(mask, 0, len(lut) - 1)], ignore).astype(np.int32)
