"""Temporal sliding-window bookkeeping.

The reference runs the UNet on 8-frame windows with stride 6 inside a Python
loop, right-aligning the last window and blending overlapped frames with a
*sequential* 0.5/0.5 running average (pipeline_upscale_a_video.py:601-635).
Under jit that loop becomes data movement: we precompute, in numpy at trace
time, (a) the static window starts — including the duplicate windows the
reference's `range` loop can produce — and (b) the per-(window, offset)
*final* blend weight each window contribution ends up with after the running
average. Gathering windows and applying one weighted scatter-add then
reproduces the reference's output exactly with a single batched UNet call (or
a scanned sequence of them).

The running average resolves to: for a frame covered by windows w_1..w_K in
processing order, weight(w_1) = 0.5^(K-1), weight(w_i) = 0.5^(K-i+1) for i≥2.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np


@functools.lru_cache(maxsize=128)
def window_starts(num_frames: int, window: int = 8, stride: int = 6) -> Tuple[int, ...]:
    """Replicates the reference loop (pipeline_upscale_a_video.py:621-625),
    duplicates and all."""
    if num_frames <= window:
        return (0,)
    starts = []
    for start in range(0, num_frames, stride):
        end = min(num_frames, start + window)
        if end - start < window:
            start = end - window
        starts.append(start)
    return tuple(starts)


@functools.lru_cache(maxsize=128)
def window_blend_matrix(num_frames: int, window: int = 8, stride: int = 6) -> np.ndarray:
    """(num_windows, window, num_frames) float32 scatter-weight tensor M such
    that ``out[t] = sum_{n,k} M[n,k,t] * pred[n][k]`` equals the reference's
    sequential overlap-averaging."""
    starts = window_starts(num_frames, window, stride)
    n_win = len(starts)
    win = min(window, num_frames)

    # per-frame list of (window_index, offset) in processing order
    cover: List[List[Tuple[int, int]]] = [[] for _ in range(num_frames)]
    for n, s in enumerate(starts):
        for k in range(win):
            cover[s + k].append((n, k))

    m = np.zeros((n_win, win, num_frames), dtype=np.float32)
    for t, entries in enumerate(cover):
        kk = len(entries)
        for i, (n, k) in enumerate(entries, start=1):
            if kk == 1:
                wgt = 1.0
            elif i == 1:
                wgt = 0.5 ** (kk - 1)
            else:
                wgt = 0.5 ** (kk - i + 1)
            m[n, k, t] = wgt
    # sanity: weights per frame sum to 1
    assert np.allclose(m.sum(axis=(0, 1)), 1.0)
    return m


@functools.lru_cache(maxsize=128)
def chunk_starts(num_frames: int, chunk: int) -> Tuple[Tuple[int, int], ...]:
    """Static (start, end) decode chunks (ref pipeline_upscale_a_video.py:685-700)."""
    if num_frames <= chunk:
        return ((0, num_frames),)
    return tuple(
        (s, min(num_frames, s + chunk)) for s in range(0, num_frames, chunk)
    )


@functools.lru_cache(maxsize=128)
def unique_window_plan(num_frames: int, window: int = 8, stride: int = 6
                       ) -> Tuple[Tuple[int, ...], np.ndarray]:
    """(unique_starts, blend) — the reference plan with duplicate windows
    COLLAPSED. The right-aligned tail can repeat a start (T ≡ 2 mod stride…:
    e.g. T=32 → 0,6,12,18,24,24; T=14 → 0,6,6; ref :621-625); a repeated
    window recomputes the identical UNet output, so its sequential-blend
    weights can be summed onto one computation. Output is bit-identical to
    the full plan while skipping 1/len(starts) of the UNet work whenever a
    duplicate exists (1 of 6 windows at the flagship T=32)."""
    starts = window_starts(num_frames, window, stride)
    blend_full = window_blend_matrix(num_frames, window, stride)
    unique: List[int] = []
    for s in starts:
        if s not in unique:
            unique.append(s)
    blend = np.zeros((len(unique),) + blend_full.shape[1:], dtype=np.float32)
    for n, s in enumerate(starts):
        blend[unique.index(s)] += blend_full[n]
    assert np.allclose(blend.sum(axis=(0, 1)), 1.0)
    return tuple(unique), blend
