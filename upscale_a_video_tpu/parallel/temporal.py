"""Temporal-chunk parallelism: shard the frame axis across chips.

The reference scales frame count by *serial* 8-frame windows (stride 6,
overlap 2, averaged — pipeline_upscale_a_video.py:601-635). Here the same
computation is distributed over a 1-D ``time`` mesh axis (SURVEY §5.7):

- each chip owns a chunk of ``T_local`` frames (multiple of the stride);
- windows *starting* in a chunk are computed locally; the final window of each
  non-last chunk spills ``window - stride`` frames into the right neighbor;
- one ``ppermute`` over ICI ships those spill predictions right, and the
  receiving chip applies the reference's sequential 0.5/0.5 blend (its own
  first-window contribution is the "later" one, matching the serial order);
- the globally-last chunk right-aligns its last window locally.

The window *plan* therefore matches the reference exactly when
``T_local % stride == 0`` and chunks tile T; chunk count 1 degenerates to the
serial plan. Communication per denoise step is 2 frames of noise-pred per
chip — tiny against the UNet compute it overlaps with.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chunked_window_starts(t_local: int, window: int, stride: int,
                          is_last: bool) -> Tuple[Tuple[int, int], ...]:
    """Local (start, needs_halo) plan for one chunk."""
    starts = []
    for s in range(0, t_local, stride):
        if s + window <= t_local:
            starts.append((s, False))
        elif not is_last:
            starts.append((s, True))  # spills into right halo
        else:
            starts.append((max(t_local - window, 0), False))  # right-align
            break
    return tuple(starts)


def sharded_windowed_apply(
    fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "time",
    window: int = 8,
    stride: int = 6,
):
    """Build a shard_map'ped function applying ``fn`` over temporal windows of
    a time-sharded video tensor with reference-equivalent overlap averaging.

    fn: (B, window, H, W, C) → (B, window, H, W, C') per-window model call
        (already closed over params/timestep/etc.).
    Returns g(x (B, T, H, W, C) sharded on axis 1) → (B, T, H, W, C').
    """
    n_chunks = mesh.shape[axis]
    overlap = window - stride

    def local_fn(x):
        # x: (B, T_local + halo?, ...) — we receive the full local chunk and
        # gather the halo from the right neighbor via ppermute.
        idx = jax.lax.axis_index(axis)
        b, t_local = x.shape[0], x.shape[1]
        is_last = idx == n_chunks - 1

        # left-edge frames of each chunk, shipped left so every chip can build
        # its spill window: neighbor's first (window - stride) frames... the
        # spill window needs `window - (t_local - start)` frames from the
        # right; with t_local % stride == 0 the spill start is
        # t_local - stride → needs (window - stride) halo frames.
        halo_src = x[:, :overlap]  # my first `overlap` frames
        # send left: chip i receives chip (i+1)'s first frames
        perm = [(i, (i - 1) % n_chunks) for i in range(n_chunks)]
        halo = jax.lax.ppermute(halo_src, axis, perm)
        x_ext = jnp.concatenate([x, halo], axis=1)  # (B, T_local + overlap, ...)

        # windows fully inside the chunk (same count on every chip)
        n_full = t_local // stride - 1  # starts 0..t_local-2*stride... compute
        starts_full = [s for s in range(0, t_local, stride) if s + window <= t_local]
        preds = []
        weights = []  # scatter weight layout per window over t_local + overlap

        acc = jnp.zeros((b, t_local + overlap) + x.shape[2:-1] + (0,), x.dtype)

        # accumulate with sequential-blend weights computed on the fly:
        # within a chunk windows are processed in order; cross-chunk the
        # received spill is always "earlier" than local windows.
        out = None
        cover = None

        def blend(out, cover, pred, start):
            seg = out[:, start:start + window]
            cov = cover[:, start:start + window]
            new = jnp.where(cov > 0, 0.5 * seg + 0.5 * pred, pred)
            out = jax.lax.dynamic_update_slice_in_dim(out, new, start, axis=1)
            cover = jax.lax.dynamic_update_slice_in_dim(
                cover, jnp.ones_like(cov), start, axis=1)
            return out, cover

        # probe output channel count with the first full window
        first_pred = fn(x_ext[:, 0:window])
        out = jnp.zeros((b, t_local + overlap) + first_pred.shape[2:], first_pred.dtype)
        cover = jnp.zeros((b, t_local + overlap) + (1,) * (first_pred.ndim - 2),
                          first_pred.dtype)
        out, cover = blend(out, cover, first_pred, 0)

        for s in starts_full[1:]:
            out, cover = blend(out, cover, fn(x_ext[:, s:s + window]), s)

        # spill window (start = t_local - stride) for non-last chunks; the
        # last chunk right-aligns (start = t_local - window) instead.
        spill_start_nonlast = t_local - stride
        spill_start_last = t_local - window
        spill_start = jnp.where(is_last, spill_start_last, spill_start_nonlast)
        spill_x = jax.lax.dynamic_slice_in_dim(x_ext, spill_start, window, axis=1)
        spill_pred = fn(spill_x)
        # scatter at the dynamic start (blend with existing coverage)
        seg = jax.lax.dynamic_slice_in_dim(out, spill_start, window, axis=1)
        cov = jax.lax.dynamic_slice_in_dim(cover, spill_start, window, axis=1)
        new = jnp.where(cov > 0, 0.5 * seg + 0.5 * spill_pred, spill_pred)
        out = jax.lax.dynamic_update_slice_in_dim(out, new, spill_start, axis=1)

        # ship the spill's halo part (last `overlap` frames of non-last chunks)
        # right, where it is the EARLIER contribution for the neighbor's first
        # `overlap` frames
        spill_tail = out[:, t_local:]
        has_spill = jnp.where(is_last, 0.0, 1.0).astype(out.dtype)
        spill_tail = spill_tail * has_spill
        perm_r = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]
        recv = jax.lax.ppermute(spill_tail, axis, perm_r)
        recv_valid = jax.lax.ppermute(
            jnp.broadcast_to(has_spill, (1,)), axis, perm_r)[0]

        head = out[:, :overlap]
        # neighbor's contribution came first in serial order → 0.5·recv + 0.5·mine
        head = jnp.where(recv_valid > 0, 0.5 * recv + 0.5 * head, head)
        out = jnp.concatenate([head, out[:, overlap:t_local]], axis=1)
        return out

    in_spec = P(None, axis)
    return shard_map(
        local_fn, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec,
        check_rep=False,
    )


def reference_windowed_apply(fn, x, window: int = 8, stride: int = 6):
    """Serial reference plan (for equivalence tests): the exact loop of
    pipeline_upscale_a_video.py:619-635 on an unsharded tensor."""
    b, t = x.shape[:2]
    out_slots = [None] * t
    if t <= window:
        pred = fn(x)
        return pred
    for start in range(0, t, stride):
        end = min(t, start + window)
        if end - start < window:
            start = end - window
        pred = fn(x[:, start:end])
        for k, idx in enumerate(range(start, end)):
            if out_slots[idx] is None:
                out_slots[idx] = pred[:, k]
            else:
                out_slots[idx] = out_slots[idx] * 0.5 + pred[:, k] * 0.5
    return jnp.stack(out_slots, axis=1)
