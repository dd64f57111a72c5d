"""Flow-guided latent propagation (ref `/root/reference/models_video/propagation_module.py`).

The released inference path uses the *training-free* propagator
(``Propagation(4, learnable=False)``, inference_upscale_a_video.py:126): two
sequential passes over the frames — backward (using forward flow) then forward
(using backward flow, chained on the backward pass output) — each step warping
the previous propagated feature, fusing it 50/50 with the current frame, and
gating by a forward-backward flow consistency mask
(propagation_module.py:194-281, fbConsistencyCheck :140-149).

TPU design: each pass is a ``jax.lax.scan`` over the time axis (a true
sequential recurrence), with the warp as the gather-based ``flow_warp`` op.
Channels-last throughout: x (B, T, H, W, C), flows (B, T-1, Hf, Wf, 2).

The learnable variant (DeformableAlignment + ConvResidualBlocks backbones,
:284-372) is implemented in ``propagation_learnable.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_2d
from ..ops.warp import flow_warp


def _length_sq(x: jax.Array) -> jax.Array:
    """Σ channels of x², keepdim (ref :137-138). x: (B, H, W, 2)."""
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def fb_consistency_check(
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jax.Array:
    """Validity mask: |wf + wb(wf(x))|² < α1·(|wf|²+|wb(wf(x))|²) + α2
    (ref :140-149). flows: (B, H, W, 2) pixel offsets. Returns (B, H, W, 1)."""
    flow_bw_warped = flow_warp(flow_bw, flow_fw, interpolation="bilinear")
    flow_diff = flow_fw + flow_bw_warped
    mag_sq = _length_sq(flow_fw) + _length_sq(flow_bw_warped)
    occ_thresh = alpha1 * mag_sq + alpha2
    return (_length_sq(flow_diff) < occ_thresh).astype(flow_fw.dtype)


def _resize_flows(flows: jax.Array, hw: Tuple[int, int], src_w: int) -> jax.Array:
    """Area-resize flows to the latent resolution and rescale magnitudes
    (ref :205-209)."""
    h, w = hw
    s = 1.0 * w / src_w
    return resize_2d(flows, (h, w), method="area") * s


def _prop_pass(
    feats: jax.Array,       # (B, T, H, W, C) input features for this pass
    flows_prop: jax.Array,  # (B, T-1, H, W, 2) flow used for warping
    flows_check: jax.Array, # (B, T-1, H, W, 2) opposite flow for the check
    reverse: bool,
    interpolation: str,
    fuse_scale: float,
    alpha1: float,
    alpha2: float,
) -> jax.Array:
    """One propagation sweep (ref :219-266), as a lax.scan recurrence.

    backward pass (reverse=True): frames t-1 → 0, warp with forward flow.
    forward pass: frames 0 → t-1, warp with backward flow.
    """
    b, t, h, w, c = feats.shape
    if t == 1:
        return feats

    if reverse:
        # step i processes frame idx = t-2-i, propagating from idx+1;
        # flow index = idx (flows_forward[idx]: frame idx → idx+1 check, warp)
        frame_seq = feats[:, :-1][:, ::-1]          # frames t-2 .. 0
        flow_prop_seq = flows_prop[:, ::-1]          # flows t-2 .. 0
        flow_check_seq = flows_check[:, ::-1]
        init = feats[:, -1]
    else:
        # step i processes frame idx = i+1, propagating from idx-1;
        # flow index = idx-1 (flows_backward[idx-1]: frame idx → idx-1)
        frame_seq = feats[:, 1:]
        flow_prop_seq = flows_prop
        flow_check_seq = flows_check
        init = feats[:, 0]

    def step(feat_prop, inputs):
        feat_current, flow_prop, flow_check = inputs
        mask = fb_consistency_check(flow_prop, flow_check, alpha1, alpha2)
        feat_warped = flow_warp(feat_prop, flow_prop, interpolation=interpolation)
        feat_warped = feat_warped * fuse_scale + feat_current * (1.0 - fuse_scale)
        feat_prop = mask * feat_warped + (1.0 - mask) * feat_current
        return feat_prop, feat_prop

    # scan over time: move T to the leading axis
    xs = (
        frame_seq.transpose(1, 0, 2, 3, 4),
        flow_prop_seq.transpose(1, 0, 2, 3, 4),
        flow_check_seq.transpose(1, 0, 2, 3, 4),
    )
    _, outs = jax.lax.scan(step, init, xs)
    outs = outs.transpose(1, 0, 2, 3, 4)  # (B, T-1, H, W, C)

    if reverse:
        return jnp.concatenate([outs[:, ::-1], feats[:, -1:]], axis=1)
    return jnp.concatenate([feats[:, :1], outs], axis=1)


def propagate_latents(
    x: jax.Array,               # (B, T, H, W, C) predicted x̂0 latents
    flows_forward: jax.Array,   # (B, T-1, Hf, Wf, 2) pixel-res forward flow
    flows_backward: jax.Array,  # (B, T-1, Hf, Wf, 2) pixel-res backward flow
    interpolation: str = "nearest",
    fuse_scale: float = 0.5,
    alpha1: float = 0.001,
    alpha2: float = 0.05,
) -> jax.Array:
    """Training-free propagation with the pipeline's released hyperparameters
    (pipeline_upscale_a_video.py:655-657). Returns the forward-pass result
    (ref :279)."""
    b, t, h, w, c = x.shape
    src_w = flows_forward.shape[3]
    ff = _resize_flows(flows_forward, (h, w), src_w)
    fb = _resize_flows(flows_backward, (h, w), src_w)

    # backward pass: warp with forward flow, check against backward flow
    feats_b = _prop_pass(x, ff, fb, reverse=True, interpolation=interpolation,
                         fuse_scale=fuse_scale, alpha1=alpha1, alpha2=alpha2)
    # forward pass (chained): warp with backward flow, check against forward
    feats_f = _prop_pass(feats_b, fb, ff, reverse=False, interpolation=interpolation,
                         fuse_scale=fuse_scale, alpha1=alpha1, alpha2=alpha2)
    return feats_f
