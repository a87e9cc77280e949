"""ctypes bindings for the native C++ data-path kernels (native/adx_data.cpp).

Builds the shared library on first use with g++ (-O3 -fopenmp), caches the
.so next to the source, and falls back to a pure-NumPy implementation when no
compiler is available. Public API:

  resize_area_batch(frames, size, scale, offset) -> float32 (n, size, size, c)
  u8_to_pm1(frames)                              -> float32 in [-1, 1]
  pm1_to_u8(frames)                              -> uint8 in [0, 255]

`resize_area_batch` reproduces cv2.INTER_AREA (fractional box filter) --
the resize the reference applies per frame (gym_dataloader.py:61).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "adx_data.cpp")
_SO = os.path.join(_NATIVE_DIR, "libadx_data.so")

_lib: Optional[ctypes.CDLL] = None
_build_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError):
        try:  # retry without -march=native / openmp (portable fallback)
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO],
                           check=True, capture_output=True, timeout=120)
            return _SO
        except (OSError, subprocess.SubprocessError):
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if unavailable
    (or if AD_TPU_NATIVE=0)."""
    global _lib, _build_failed
    if os.environ.get("AD_TPU_NATIVE") == "0":
        return None
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.adx_resize_area_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.adx_u8_to_f32.argtypes = [u8p, ctypes.c_int64, f32p,
                                      ctypes.c_float, ctypes.c_float]
        lib.adx_f32_to_u8.argtypes = [f32p, ctypes.c_int64, u8p,
                                      ctypes.c_float, ctypes.c_float]
        lib.adx_version.restype = ctypes.c_int
        _lib = lib
    return _lib


def _resize_area_numpy(frames: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Fractional-box area resize in NumPy (fallback path)."""
    n, sh, sw, c = frames.shape

    def axis_matrix(src, dst):
        m = np.zeros((dst, src), np.float32)
        scale = src / dst
        for i in range(dst):
            lo, hi = i * scale, (i + 1) * scale
            b, e = int(lo), min(int(np.ceil(hi)), src)
            for j in range(b, e):
                m[i, j] = min(j + 1, hi) - max(j, lo)
            m[i] /= hi - lo
        return m

    my = axis_matrix(sh, dh)
    mx = axis_matrix(sw, dw)
    x = frames.astype(np.float32)
    x = np.einsum("ys,nswc->nywc", my, x)
    return np.einsum("xs,nysc->nyxc", mx, x)


def resize_area_batch(frames: np.ndarray, size, scale: float = 1.0,
                      offset: float = 0.0) -> np.ndarray:
    """INTER_AREA resize of (n, h, w, c) uint8 frames to (n, dh, dw, c)
    float32, fused with an affine transform of the pixel values."""
    frames = np.ascontiguousarray(frames)
    assert frames.dtype == np.uint8 and frames.ndim == 4
    dh, dw = (size, size) if isinstance(size, int) else size
    n, sh, sw, c = frames.shape
    lib = get_lib()
    out = np.empty((n, dh, dw, c), np.float32)
    if lib is not None:
        lib.adx_resize_area_batch(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, sh, sw, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dh, dw, scale, offset)
        return out
    return _resize_area_numpy(frames, dh, dw) * scale + offset


def u8_to_pm1(frames: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (the reference's frames/127.5 - 1)."""
    frames = np.ascontiguousarray(frames)
    assert frames.dtype == np.uint8
    lib = get_lib()
    if lib is None:
        return frames.astype(np.float32) / 127.5 - 1.0
    out = np.empty(frames.shape, np.float32)
    lib.adx_u8_to_f32(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.float32(1.0 / 127.5), np.float32(-1.0))
    return out


def pm1_to_u8(frames: np.ndarray) -> np.ndarray:
    """float32 [-1,1] -> uint8 [0,255] with clamp (display/decode path)."""
    frames = np.ascontiguousarray(frames, np.float32)
    lib = get_lib()
    if lib is None:
        return np.clip((frames + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    out = np.empty(frames.shape, np.uint8)
    lib.adx_f32_to_u8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.float32(127.5), np.float32(127.5))
    return out
