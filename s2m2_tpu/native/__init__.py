"""ctypes bindings for the native preprocessing library.

Builds lazily with `make` on first use if the .so is missing; every entry
point has a numpy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libs2m2_preprocess.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.remap_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, f32p, f32p, ctypes.c_int,
                                      ctypes.c_int, u8p]
    lib.image_pad_blur_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, f32p, f32p]
    lib.u8_to_f32.argtypes = [u8p, ctypes.c_int64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def remap_bilinear(img, map_x, map_y):
    """Native cv2.remap(INTER_LINEAR, BORDER_CONSTANT) equivalent.
    img: (h, w, c) uint8; maps: (h_out, w_out) float32."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    map_x = np.ascontiguousarray(map_x, np.float32)
    map_y = np.ascontiguousarray(map_y, np.float32)
    h, w, c = img.shape
    ho, wo = map_x.shape
    out = np.empty((ho, wo, c), np.uint8)
    if lib is None:
        # numpy fallback
        x0 = np.floor(map_x).astype(int)
        y0 = np.floor(map_y).astype(int)
        ax = (map_x - x0)[..., None]
        ay = (map_y - y0)[..., None]
        acc = np.zeros((ho, wo, c), np.float32)
        for dy in (0, 1):
            yy = y0 + dy
            wy = ay if dy else 1 - ay
            for dx in (0, 1):
                xx = x0 + dx
                wx = ax if dx else 1 - ax
                valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                vals = img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
                acc += wy * wx * np.where(valid[..., None], vals, 0)
        out = np.clip(np.rint(acc), 0, 255).astype(np.uint8)
        return out if c > 1 else out[..., 0]
    lib.remap_bilinear_u8(_ptr(img, ctypes.c_uint8), h, w, c,
                          _ptr(map_x, ctypes.c_float),
                          _ptr(map_y, ctypes.c_float), ho, wo,
                          _ptr(out, ctypes.c_uint8))
    return out if c > 1 else out[..., 0]


def image_pad_native(img, factor=32):
    """Native single-frame blurred-fill pad; img: (h, w, c) float32.
    Returns (h_new, w_new, c) float32 or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    h_new = -(-h // factor) * factor
    w_new = -(-w // factor) * factor
    out = np.empty((h_new, w_new, c), np.float32)
    scratch = np.empty((max(h // factor, 1), max(w // factor, 1), c),
                       np.float32)
    lib.image_pad_blur_f32(_ptr(img, ctypes.c_float), h, w, c, factor,
                           _ptr(out, ctypes.c_float),
                           _ptr(scratch, ctypes.c_float))
    return out
