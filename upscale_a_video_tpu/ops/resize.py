"""Separable image resizing as dense matrix products.

Replaces every ``F.interpolate`` use in the reference (driver bicubic/area,
RAFT /8 resize, propagation flow resize, VAE nearest upsample) with a
TPU-friendly formulation: for static shapes we precompute 1-D resampling
weight matrices in numpy and apply them as two einsum contractions — matmuls
that XLA maps onto the MXU, instead of gather ops.

Kernels match torch semantics exactly:
- ``nearest``: src = floor(i * in / out)
- ``bilinear``/``trilinear`` (align_corners=False): half-pixel centers
- ``bilinear`` (align_corners=True): src = i * (in-1)/(out-1)
- ``bicubic``: Keys kernel with a = -0.75 (torch's constant; note jax.image
  uses a = -0.5, which is why we don't call it)
- ``area``: adaptive average pooling (exact for non-integer ratios)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float32)
    src = (np.arange(out_size) * in_size // out_size).clip(0, in_size - 1)
    w[np.arange(out_size), src] = 1.0
    return w


def _linear_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        # torch: single output samples src 0 (align) or center (half-pixel → 0 after clamp)
        if align_corners or in_size == 1:
            w[0, 0] = 1.0
            return w.astype(np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w[np.arange(out_size), lo] += 1 - frac
    w[np.arange(out_size), hi] += frac
    return w.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    out = np.zeros_like(ax)
    m1 = ax <= 1
    m2 = (ax > 1) & (ax < 2)
    out[m1] = (a + 2) * ax[m1] ** 3 - (a + 3) * ax[m1] ** 2 + 1
    out[m2] = a * ax[m2] ** 3 - 5 * a * ax[m2] ** 2 + 8 * a * ax[m2] - 4 * a
    return out


def _cubic_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    for tap in range(-1, 3):
        idx = np.clip(lo + tap, 0, in_size - 1)  # border replicate
        k = _cubic_kernel(tap - frac)
        np.add.at(w, (np.arange(out_size), idx), k)
    return w.astype(np.float32)


def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Adaptive average pooling weights (torch 'area' mode)."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        w[i, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=512)
def _weight_matrix(method: str, out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    if out_size == in_size and method != "area":
        return np.eye(out_size, dtype=np.float32)
    if method == "nearest":
        return _nearest_matrix(out_size, in_size)
    if method in ("bilinear", "linear", "trilinear"):
        return _linear_matrix(out_size, in_size, align_corners)
    if method == "bicubic":
        return _cubic_matrix(out_size, in_size, align_corners)
    if method == "area":
        return _area_matrix(out_size, in_size)
    raise ValueError(f"unknown resize method {method!r}")


def resize_2d(
    x: jax.Array,
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jax.Array:
    """Resize the (-3, -2) spatial axes of a channels-last array.

    x: (..., H, W, C) → (..., out_h, out_w, C). Same dtype as input;
    accumulation in fp32.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (h, w) and method != "area":
        return x
    wh = jnp.asarray(_weight_matrix(method, oh, h, align_corners))
    ww = jnp.asarray(_weight_matrix(method, ow, w, align_corners))
    dtype = x.dtype
    y = jnp.einsum("Hh,...hwc->...Hwc", wh, x.astype(jnp.float32))
    y = jnp.einsum("Ww,...hwc->...hWc", ww, y)
    return y.astype(dtype)


def resize_video(
    x: jax.Array,
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jax.Array:
    """Alias for clarity: (B, T, H, W, C) spatial resize, frames independent."""
    return resize_2d(x, out_hw, method, align_corners)
