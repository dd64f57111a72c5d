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

The window *plan* matches the reference exactly when ``T_local % stride == 0``
and chunks tile T; one chunk degenerates to the serial plan. Communication per
step is ``window - stride`` frames of noise-pred per chip — tiny against the
UNet compute it overlaps.

``windowed_apply_local`` is usable inside any existing ``shard_map`` (the
sharded denoise pipeline, parallel/sharded_pipeline.py, scans over timesteps
around it); ``sharded_windowed_apply`` wraps it for standalone use. Inputs may
be pytrees sharing the frame axis (latents + LR frames).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def local_window_count(t_local: int, n_chunks: int, window: int = 8,
                       stride: int = 6) -> int:
    """Windows each chip computes (stable across chips/steps) — the length of
    the per-window cache list ``windowed_apply_local`` expects."""
    if n_chunks == 1:
        # mirror the execution loop below: it stops only after computing a
        # right-aligned window (s + window > t); when s + window == t the
        # reference's range continues and re-blends a duplicate right-aligned
        # window (ref pipeline_upscale_a_video.py:621-634 has no break)
        n = 0
        for s in range(0, t_local, stride):
            n += 1
            if s + window > t_local:
                break
        return n
    full = len([s for s in range(0, t_local, stride) if s + window <= t_local])
    return full + 1  # + spill/right-aligned window


def windowed_apply_local(
    fn: Callable,
    xs,                      # pytree of (B, T_local, ...) arrays (same T axis)
    axis: str,
    n_chunks: int,
    window: int = 8,
    stride: int = 6,
    caches=None,
):
    """Run ``fn`` over temporal windows of time-sharded tensors with
    reference-equivalent overlap averaging. Must execute inside a shard_map
    over ``axis``. fn: pytree of (B, window, ...) → (B, window, ...) array.

    With ``caches`` (a list of per-window cache pytrees, one per local window
    in plan order — see :func:`local_window_count`), ``fn(xs_w, cache)`` must
    return ``(pred, new_cache)`` and the call returns ``(out, new_caches)``.
    Every global window is computed by exactly one chip, so per-window caches
    (PAB attention deltas) stay chip-local across denoise steps — no extra
    communication."""
    overlap = window - stride
    leaves = jax.tree.leaves(xs)
    b, t_local = leaves[0].shape[0], leaves[0].shape[1]
    assert t_local % stride == 0 and t_local >= window, (
        f"T_local={t_local} must be a multiple of stride {stride} and >= window"
    )
    idx = jax.lax.axis_index(axis) if n_chunks > 1 else 0
    is_last = idx == n_chunks - 1
    new_caches = []

    def call(xs_w, wi):
        if caches is None:
            return fn(xs_w)
        pred, nc = fn(xs_w, caches[wi])
        new_caches.append(nc)
        return pred

    if n_chunks == 1:
        # serial plan on one chip (exactly the reference loop)
        starts = [s for s in range(0, t_local, stride)]
        out = None
        cover = None
        for wi, s in enumerate(starts):
            if s + window <= t_local:
                a, e = s, s + window
            else:
                a, e = t_local - window, t_local
            pred = call(jax.tree.map(lambda x: x[:, a:e], xs), wi)
            if out is None:
                out = jnp.zeros((b, t_local) + pred.shape[2:], pred.dtype)
                cover = jnp.zeros((b, t_local) + (1,) * (pred.ndim - 2), pred.dtype)
            seg = out[:, a:e]
            cov = cover[:, a:e]
            new = jnp.where(cov > 0, 0.5 * seg + 0.5 * pred, pred)
            out = out.at[:, a:e].set(new)
            cover = cover.at[:, a:e].set(1.0)
            if e == t_local and s + window > t_local:
                break
        if caches is not None:
            return out, new_caches
        return out

    # multi-chunk: gather right halo, compute local + spill windows, exchange
    halo = jax.tree.map(
        lambda x: jax.lax.ppermute(
            x[:, :overlap], axis,
            [(i, (i - 1) % n_chunks) for i in range(n_chunks)]),
        xs,
    )
    xs_ext = jax.tree.map(
        lambda x, h: jnp.concatenate([x, h], axis=1), xs, halo)

    starts_full = [s for s in range(0, t_local, stride) if s + window <= t_local]

    def blend_static(out, cover, pred, start):
        seg = out[:, start:start + window]
        cov = cover[:, start:start + window]
        new = jnp.where(cov > 0, 0.5 * seg + 0.5 * pred, pred)
        out = out.at[:, start:start + window].set(new)
        cover = cover.at[:, start:start + window].set(1.0)
        return out, cover

    first_pred = call(jax.tree.map(lambda x: x[:, 0:window], xs_ext), 0)
    out = jnp.zeros((b, t_local + overlap) + first_pred.shape[2:], first_pred.dtype)
    cover = jnp.zeros((b, t_local + overlap) + (1,) * (first_pred.ndim - 2),
                      first_pred.dtype)
    out, cover = blend_static(out, cover, first_pred, 0)
    for wi, s in enumerate(starts_full[1:], start=1):
        out, cover = blend_static(out, cover,
                                  call(jax.tree.map(lambda x: x[:, s:s + window],
                                                    xs_ext), wi), s)

    # spill window: start t_local - stride (non-last) or right-aligned (last)
    spill_start = jnp.where(is_last, t_local - window, t_local - stride)
    spill_xs = jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, spill_start, window, axis=1),
        xs_ext)
    spill_pred = call(spill_xs, len(starts_full))
    seg = jax.lax.dynamic_slice_in_dim(out, spill_start, window, axis=1)
    cov = jax.lax.dynamic_slice_in_dim(cover, spill_start, window, axis=1)
    new = jnp.where(cov > 0, 0.5 * seg + 0.5 * spill_pred, spill_pred)
    out = jax.lax.dynamic_update_slice_in_dim(out, new, spill_start, axis=1)

    # ship spill tail right: it is the EARLIER contribution for the neighbor's
    # first `overlap` frames
    spill_tail = out[:, t_local:]
    has_spill = jnp.where(is_last, 0.0, 1.0).astype(out.dtype)
    spill_tail = spill_tail * has_spill
    perm_r = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]
    recv = jax.lax.ppermute(spill_tail, axis, perm_r)
    recv_valid = jax.lax.ppermute(jnp.broadcast_to(has_spill, (1,)), axis, perm_r)[0]

    head = out[:, :overlap]
    head = jnp.where(recv_valid > 0, 0.5 * recv + 0.5 * head, head)
    result = jnp.concatenate([head, out[:, overlap:t_local]], axis=1)
    if caches is not None:
        return result, new_caches
    return result


def sharded_windowed_apply(
    fn: Callable,
    mesh: Mesh,
    axis: str = "time",
    window: int = 8,
    stride: int = 6,
):
    """Standalone shard_map wrapper over :func:`windowed_apply_local` for a
    single (B, T, ...) tensor sharded on axis 1."""
    n_chunks = mesh.shape[axis]

    def local_fn(x):
        return windowed_apply_local(lambda w: fn(w), x, axis, n_chunks,
                                    window, stride)

    in_spec = P(None, axis)
    return shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec, check_rep=False)


def reference_windowed_apply(fn, x, window: int = 8, stride: int = 6):
    """Serial reference plan (for equivalence tests): the exact loop of
    pipeline_upscale_a_video.py:619-635 on an unsharded tensor."""
    b, t = x.shape[:2]
    out_slots = [None] * t
    if t <= window:
        return fn(x)
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
