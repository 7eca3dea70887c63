"""ctypes bindings for the native C++ image ops (``native/image_ops.cpp``).

Loads ``libflux2_image_ops.so``; if it is missing, attempts a one-time
``make`` build (g++ is part of the toolchain), and otherwise falls back to
numpy implementations with identical semantics. Every function here is
host-side preprocessing — the TPU compute path never goes through it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libflux2_image_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.area_resize_f32.argtypes = [_f32p, ctypes.c_int, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_int]
        lib.resize_bilinear_f32.argtypes = [_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_int]
        lib.u8_to_f32.argtypes = [_u8p, _f32p, ctypes.c_longlong]
        lib.f32_to_u8.argtypes = [_f32p, _u8p, ctypes.c_longlong]
        lib.soft_composite_f32.argtypes = [_f32p, _f32p, _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.dilate_ramp_f32.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _f32p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def area_resize(plane: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Exact box-filter resample of a [H, W] f32 plane to [dh, dw]."""
    plane = np.ascontiguousarray(plane, np.float32)
    sh, sw = plane.shape
    lib = _load()
    if lib is not None:
        out = np.empty((dh, dw), np.float32)
        lib.area_resize_f32(_fp(plane), sh, sw, _fp(out), dh, dw)
        return out
    # numpy fallback (identical cell semantics)
    ys = np.linspace(0, sh, dh + 1).astype(int)
    xs = np.linspace(0, sw, dw + 1).astype(int)
    out = np.empty((dh, dw), np.float32)
    for i in range(dh):
        for j in range(dw):
            cell = plane[ys[i] : max(ys[i] + 1, ys[i + 1]), xs[j] : max(xs[j] + 1, xs[j + 1])]
            out[i, j] = cell.mean()
    return out


def resize_bilinear(image: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Bilinear resample of a [H, W, C] f32 image (half-pixel centers)."""
    image = np.ascontiguousarray(image, np.float32)
    sh, sw, c = image.shape
    lib = _load()
    out = np.empty((dh, dw, c), np.float32)
    if lib is not None:
        lib.resize_bilinear_f32(_fp(image), sh, sw, c, _fp(out), dh, dw)
        return out
    fy = (np.arange(dh) + 0.5) * sh / dh - 0.5
    fx = (np.arange(dw) + 0.5) * sw / dw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, sh - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, sw - 1)
    y1 = np.clip(y0 + 1, 0, sh - 1)
    x1 = np.clip(x0 + 1, 0, sw - 1)
    wy = np.clip(fy - np.floor(fy), 0, 1)[:, None, None]
    wx = np.clip(fx - np.floor(fx), 0, 1)[None, :, None]
    top = image[y0][:, x0] * (1 - wx) + image[y0][:, x1] * wx
    bot = image[y1][:, x0] * (1 - wx) + image[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def u8_to_f32(image: np.ndarray) -> np.ndarray:
    image = np.ascontiguousarray(image, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(image.shape, np.float32)
        lib.u8_to_f32(image.ctypes.data_as(_u8p), _fp(out), image.size)
        return out
    return image.astype(np.float32) / 255.0


def f32_to_u8(image: np.ndarray) -> np.ndarray:
    image = np.ascontiguousarray(image, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(image.shape, np.uint8)
        lib.f32_to_u8(_fp(image), out.ctypes.data_as(_u8p), image.size)
        return out
    return np.clip(image * 255.0 + 0.5, 0, 255).astype(np.uint8)


def dilate_ramp(mask: np.ndarray, dilation: int, ramp: int) -> Optional[np.ndarray]:
    """Square-element dilation + linear inward edge ramp on a [H, W] mask,
    O(H*W) via two chamfer distance transforms in C++. Returns None when the
    native library is unavailable (callers keep their iterated-erosion
    fallback — same semantics, O(radius*H*W))."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.float32)
    h, w = mask.shape
    tmp = np.empty((2, h, w), np.float32)
    out = np.empty((h, w), np.float32)
    lib.dilate_ramp_f32(_fp(mask), h, w, int(dilation), int(ramp), _fp(tmp), _fp(out))
    return out


def soft_composite(orig: np.ndarray, gen: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """out = m*gen + (1-m)*orig for [H, W, C] images and a [H, W] mask."""
    orig = np.ascontiguousarray(orig, np.float32)
    gen = np.ascontiguousarray(gen, np.float32)
    mask = np.ascontiguousarray(mask, np.float32)
    h, w, c = orig.shape
    lib = _load()
    if lib is not None:
        out = np.empty_like(orig)
        lib.soft_composite_f32(_fp(orig), _fp(gen), _fp(mask), _fp(out), h, w, c)
        return out
    return mask[..., None] * gen + (1 - mask[..., None]) * orig
