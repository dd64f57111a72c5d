"""ctypes bindings for the native frame-processing library (native/frameproc.cpp).

Builds the shared library on first use (g++, see native/Makefile) and exposes
the three host-side pixel kernels with numpy fallbacks, so the package works
even without a toolchain. The native path is multithreaded and writes directly
into the array ``jax.device_put`` consumes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libframeproc.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fp_normalize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.fp_denormalize_f32.argtypes = lib.fp_normalize_u8.argtypes
        lib.fp_area_downsample4.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        # ring buffer (see native/frameproc.cpp ring section)
        lib.fp_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.fp_ring_create.restype = ctypes.c_void_p
        lib.fp_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_ring_close.argtypes = [ctypes.c_void_p]
        lib.fp_ring_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fp_ring_reserve.restype = ctypes.c_int64
        lib.fp_ring_slot.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fp_ring_slot.restype = ctypes.c_void_p
        lib.fp_ring_commit.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fp_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fp_ring_pop.restype = ctypes.c_int64
        lib.fp_ring_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fp_ring_pending.argtypes = [ctypes.c_void_p]
        lib.fp_ring_pending.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _threads() -> int:
    return min(os.cpu_count() or 1, 16)


def normalize_u8(frames: np.ndarray) -> np.ndarray:
    """(T,H,W,C) uint8 → float32 [-1,1]; native when available."""
    assert frames.dtype == np.uint8
    lib = _load()
    if lib is None:
        return (frames.astype(np.float32) / 255.0 - 0.5) * 2.0
    frames = np.ascontiguousarray(frames)
    out = np.empty(frames.shape, dtype=np.float32)
    t = frames.shape[0]
    hwc = int(np.prod(frames.shape[1:]))
    lib.fp_normalize_u8(frames.ctypes.data, out.ctypes.data, t, hwc, _threads())
    return out


def denormalize_f32(frames: np.ndarray) -> np.ndarray:
    """(T,H,W,C) float32 [-1,1] → uint8."""
    lib = _load()
    if lib is None:
        return (np.clip(frames / 2 + 0.5, 0, 1) * 255).astype(np.uint8)
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    out = np.empty(frames.shape, dtype=np.uint8)
    t = frames.shape[0]
    hwc = int(np.prod(frames.shape[1:]))
    lib.fp_denormalize_f32(frames.ctypes.data, out.ctypes.data, t, hwc, _threads())
    return out


def area_downsample4(frames: np.ndarray) -> np.ndarray:
    """(T,H,W,C) float32 → (T,H/4,W/4,C) 4×4 box average."""
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    t, h, w, c = frames.shape
    lib = _load()
    if lib is None:
        cropped = frames[:, : h // 4 * 4, : w // 4 * 4]
        return cropped.reshape(t, h // 4, 4, w // 4, 4, c).mean(axis=(2, 4))
    out = np.empty((t, h // 4, w // 4, c), dtype=np.float32)
    lib.fp_area_downsample4(frames.ctypes.data, out.ctypes.data, t, h, w, c,
                            _threads())
    return out
