"""Distributed flow-guided latent propagation with O(1) boundary exchange.

The training-free propagator (ref propagation_module.py:194-281) is a true
frame-sequential recurrence, so a time-sharded pipeline cannot parallelize it
without changing results (SURVEY §5.7 hard part #4). The previous scheme kept
serial-exact semantics by all-gathering the full latent clip to every chip —
O(T) frames of ICI traffic per propagation step.

This module keeps the semantics bit-exact while exchanging only
chunk-BOUNDARY features: the recurrence is pipelined across the mesh. For the
backward pass, the last chip runs its chunk first; its chunk-edge output (ONE
frame) ppermutes to the previous chip, which then runs its chunk, and so on.
Per propagation step the wire carries 2·(N-1) single frames instead of two
full-clip gathers — an L× volume reduction (L = frames per chip). Total
sequential depth is unchanged (the chain is inherently serial); per-chip
compute is the same N·L frame-steps the replicated scheme paid, so wall-clock
is neutral and the win is purely communication volume (and HBM: no full-T
gather buffer).

Used inside ``shard_map`` (parallel/sharded_pipeline.py) with the frame axis
sharded and the flows replicated. Equivalence vs the serial
``propagate_latents`` is asserted in tests/test_distributed_propagation.py
and the multi-chip dryrun.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.propagation import _resize_flows, fb_consistency_check
from ..ops.warp import flow_warp


def comm_bytes_estimate(shape, n_chunks: int, dtype_bytes: int = 4) -> dict:
    """Wire-volume accounting for one propagation step: the old all-gather
    plan vs this boundary-exchange plan. shape = (B, T, H, W, C) global."""
    b, t, h, w, c = shape
    frame = b * h * w * c * dtype_bytes
    return {
        "allgather_bytes": 2 * (n_chunks - 1) * t // n_chunks * frame * n_chunks,
        "boundary_bytes": 2 * (n_chunks - 1) * frame,
    }


def _local_pass(feats, flow_prop, flow_check, valid, boundary, reverse,
                interpolation, fuse_scale, alpha1, alpha2):
    """One chunk-local sweep seeded from ``boundary``.

    feats: (B, L, H, W, C); flow_prop/flow_check: (B, L, h, w, 2) — entry j
    is the flow used when processing local frame j (already aligned by the
    caller, dummy-padded where ``valid`` is False); valid: (L,) bool — False
    marks the global chain endpoint frame (passthrough, resets the carry to
    the current frame, exactly the serial plan's unprocessed first frame).
    """
    def step(feat_prop, inputs):
        feat_current, fp, fc, v = inputs
        mask = fb_consistency_check(fp, fc, alpha1, alpha2)
        feat_warped = flow_warp(feat_prop, fp, interpolation=interpolation)
        feat_warped = feat_warped * fuse_scale + feat_current * (1.0 - fuse_scale)
        out = mask * feat_warped + (1.0 - mask) * feat_current
        out = jnp.where(v, out, feat_current)
        return out, out

    order = slice(None, None, -1) if reverse else slice(None)
    xs = (
        feats[:, order].transpose(1, 0, 2, 3, 4),
        flow_prop[:, order].transpose(1, 0, 2, 3, 4),
        flow_check[:, order].transpose(1, 0, 2, 3, 4),
        valid[order],
    )
    _, outs = jax.lax.scan(step, boundary, xs)
    outs = outs.transpose(1, 0, 2, 3, 4)
    return outs[:, order]  # back to ascending frame order


def _pipelined_pass(feats, flow_prop_local, flow_check_local, valid, axis,
                    n_chunks, reverse, interpolation, fuse_scale,
                    alpha1, alpha2):
    """Chain the chunk-local pass across the mesh, boundary frame by
    ppermute. reverse=True: last chip first, boundaries flow toward chip 0
    (each chip's ascending-order frame 0 output seeds its left neighbour);
    reverse=False: chip 0 first, boundaries flow right (frame L-1 output
    seeds the right neighbour)."""
    idx = jax.lax.axis_index(axis)
    if reverse:
        perm = [(c, c - 1) for c in range(1, n_chunks)]
        edge = 0           # ascending-order local index sent onward
        active_of = lambda k: n_chunks - 1 - k
    else:
        perm = [(c, c + 1) for c in range(n_chunks - 1)]
        edge = -1
        active_of = lambda k: k

    def body(k, state):
        result, boundary = state
        out = _local_pass(feats, flow_prop_local, flow_check_local, valid,
                          boundary, reverse, interpolation, fuse_scale,
                          alpha1, alpha2)
        active = idx == active_of(k)
        result = jnp.where(active, out, result)
        boundary_next = jax.lax.ppermute(out[:, edge], axis, perm)
        return result, boundary_next

    b, l, h, w, c = feats.shape
    init = (jnp.zeros_like(feats), jnp.zeros((b, h, w, c), feats.dtype))
    result, _ = jax.lax.fori_loop(0, n_chunks, body, init)
    return result


def distributed_propagate_latents(
    x_local: jax.Array,          # (B, L, H, W, C) this chip's frame chunk
    flows_forward: jax.Array,    # (B, T-1, Hf, Wf, 2) REPLICATED, pixel res
    flows_backward: jax.Array,   # (B, T-1, Hf, Wf, 2) REPLICATED
    axis: str,
    n_chunks: int,
    interpolation: str = "nearest",
    fuse_scale: float = 0.5,
    alpha1: float = 0.001,
    alpha2: float = 0.05,
) -> jax.Array:
    """Serial-exact ``propagate_latents`` on time-sharded latents (call
    inside shard_map). Matches models/propagation.propagate_latents
    bit-for-bit (tested); only the communication pattern differs."""
    b, l, h, w, c = x_local.shape
    t = l * n_chunks
    idx = jax.lax.axis_index(axis)
    start = idx * l

    src_w = flows_forward.shape[3]
    ff = _resize_flows(flows_forward, (h, w), src_w)
    fb = _resize_flows(flows_backward, (h, w), src_w)
    dummy = jnp.zeros_like(ff[:, :1])

    def local_slice(flows):
        return jax.lax.dynamic_slice_in_dim(flows, start, l, axis=1)

    # ---- backward pass: process frame j with flow index j (warp with the
    # forward flow, check against backward); global frame T-1 is the chain
    # endpoint (valid=False). Pad index T-1 with a dummy so the slice exists.
    ff_pad = jnp.concatenate([ff, dummy], axis=1)
    fb_pad = jnp.concatenate([fb, dummy], axis=1)
    valid_b = start + jnp.arange(l) < t - 1
    feats_b = _pipelined_pass(
        x_local, local_slice(ff_pad), local_slice(fb_pad), valid_b, axis,
        n_chunks, True, interpolation, fuse_scale, alpha1, alpha2)

    # ---- forward pass (chained on the backward output): process frame j
    # with flow index j-1 (warp with the backward flow); global frame 0 is
    # the endpoint. Front-pad so padded[j] == flows[j-1].
    fb_pad = jnp.concatenate([dummy, fb], axis=1)
    ff_pad = jnp.concatenate([dummy, ff], axis=1)
    valid_f = start + jnp.arange(l) > 0
    return _pipelined_pass(
        feats_b, local_slice(fb_pad), local_slice(ff_pad), valid_f, axis,
        n_chunks, False, interpolation, fuse_scale, alpha1, alpha2)
