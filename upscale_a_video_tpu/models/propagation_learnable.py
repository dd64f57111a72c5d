"""Learnable flow-guided propagation (ref propagation_module.py:158-281
``learnable=True`` branch, weights shipped under ``propagator/`` in the
release bundle).

Per direction: a DeformableAlignment (modulated DCN whose offsets are the
resized flow plus a bounded tanh residual predicted from
[current, warped, flow, validity-mask], ref :333-372) and a ConvResidualBlocks
backbone refining [current, propagated] (ref :257-259); then a 3-way fuse of
[input, backward, forward] features with a residual connection (ref :271-277).

Sequential frame recurrence stays a ``lax.scan``; the DCN is the gather-based
``ops.deform_conv`` (N4). Parameters are primed by one explicit step before the
scan so flax never creates variables inside the loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d
from ..ops.warp import flow_warp
from .propagation import _resize_flows, fb_consistency_check


class ResidualBlockNoBN(nn.Module):
    """ref propagation_module.py:59-83 (init scale 0.1 on conv weights)."""

    num_feat: int = 64

    @nn.compact
    def __call__(self, x):
        scaled_init = nn.initializers.variance_scaling(0.1 * 2.0, "fan_in", "normal")
        out = nn.Conv(self.num_feat, (3, 3), padding="SAME",
                      kernel_init=scaled_init, name="conv1")(x)
        out = jax.nn.relu(out)
        out = nn.Conv(self.num_feat, (3, 3), padding="SAME",
                      kernel_init=scaled_init, name="conv2")(out)
        return x + out


class ConvResidualBlocks(nn.Module):
    """conv + LeakyReLU(0.1) + N residual blocks (ref :85-101)."""

    num_out_ch: int = 64
    num_blocks: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="main_0")(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.num_out_ch, name=f"main_2_{i}")(x)
        return x


class DeformableAlignment(nn.Module):
    """Modulated DCN with flow-conditioned offsets (ref :333-372)."""

    channels: int
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x, cond_feat, flow):
        """x: (B,H,W,C); cond: (B,H,W,2C+3); flow: (B,H,W,2) in (x, y)."""
        c = self.channels
        h = cond_feat
        for i in range(3):
            h = nn.Conv(c, (3, 3), padding="SAME", name=f"conv_offset_{2 * i}")(h)
            h = jax.nn.leaky_relu(h, negative_slope=0.1)
        h = nn.Conv(
            27 * self.deformable_groups, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="conv_offset_6",
        )(h)
        o1, o2, mask = jnp.split(h, 3, axis=-1)

        # offsets: bounded residual + flow flipped to (y, x) and repeated per
        # tap (ref :364-365; torchvision layout 2t=Δy, 2t+1=Δx)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1)
        )
        flow_yx = jnp.stack([flow[..., 1], flow[..., 0]], axis=-1)
        offset = offset + jnp.tile(flow_yx, (1, 1, 1, offset.shape[-1] // 2))

        mask = jax.nn.sigmoid(mask)

        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3.0, "fan_in", "uniform"),
            (3, 3, c, c),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        return deform_conv2d(x, offset, weight, bias, padding=1, mask=mask)


class _Adapter(nn.Module):
    """Conv3d kernel (3,1,1) channel adapter (ref :173-174)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)), name="conv")(x)


class LearnablePropagation(nn.Module):
    """ref Propagation(learnable=True) forward (:194-281)."""

    in_channels: int
    mid_channels: int = 256
    num_blocks: int = 2
    max_residue_magnitude: float = 10.0

    def setup(self):
        if self.mid_channels != self.in_channels:
            self.input_layer = _Adapter(self.mid_channels)
            self.output_layer = _Adapter(self.in_channels)
        self.deform_align = {
            m: DeformableAlignment(
                self.mid_channels, deformable_groups=16,
                max_residue_magnitude=self.max_residue_magnitude,
                name=f"deform_align_{m}",
            )
            for m in ("backward_prop", "forward_prop")
        }
        self.backbone = {
            m: ConvResidualBlocks(self.mid_channels, self.num_blocks,
                                  name=f"backbone_{m}")
            for m in ("backward_prop", "forward_prop")
        }
        self.fuse = ConvResidualBlocks(self.mid_channels, 2, name="fuse")

    def _step(self, module_name, feat_prop, feat_current, flow_prop, flow_check,
              interpolation, alpha1, alpha2):
        mask = fb_consistency_check(flow_prop, flow_check, alpha1, alpha2)
        feat_warped = flow_warp(feat_prop, flow_prop, interpolation=interpolation)
        cond = jnp.concatenate([feat_current, feat_warped, flow_prop, mask], axis=-1)
        feat_prop = self.deform_align[module_name](feat_prop, cond, flow_prop)
        feat_prop = feat_prop + self.backbone[module_name](
            jnp.concatenate([feat_current, feat_prop], axis=-1))
        return feat_prop

    def _run_pass(self, module_name, feats, flows_prop, flows_check,
                  interpolation, alpha1, alpha2, reverse):
        if reverse:
            frame_seq = feats[:, :-1][:, ::-1]
            fp = flows_prop[:, ::-1]
            fc = flows_check[:, ::-1]
            first = feats[:, -1]
        else:
            frame_seq = feats[:, 1:]
            fp = flows_prop
            fc = flows_check
            first = feats[:, 0]

        # i == 0: feat_prop = feat_current, then backbone refine (ref :237-259)
        first = first + self.backbone[module_name](
            jnp.concatenate([first, first], axis=-1))

        # prime remaining params (deform_align) outside the scan
        _ = self._step(module_name, first, frame_seq[:, 0], fp[:, 0], fc[:, 0],
                       interpolation, alpha1, alpha2)
        if self.is_initializing():
            t = feats.shape[1]
            return feats  # params created; value unused at init

        def body(carry, xs):
            feat_current, flow_prop, flow_check = xs
            feat_prop = self._step(module_name, carry, feat_current, flow_prop,
                                   flow_check, interpolation, alpha1, alpha2)
            return feat_prop, feat_prop

        xs = (frame_seq.transpose(1, 0, 2, 3, 4),
              fp.transpose(1, 0, 2, 3, 4),
              fc.transpose(1, 0, 2, 3, 4))
        _, outs = jax.lax.scan(body, first, xs)
        outs = outs.transpose(1, 0, 2, 3, 4)
        if reverse:
            return jnp.concatenate([outs[:, ::-1], first[:, None]], axis=1)
        return jnp.concatenate([first[:, None], outs], axis=1)

    def __call__(
        self,
        x: jax.Array,               # (B, T, H, W, C)
        flows_forward: jax.Array,   # (B, T-1, Hf, Wf, 2)
        flows_backward: jax.Array,
        interpolation: str = "bilinear",
        alpha1: float = 0.01,
        alpha2: float = 0.5,
    ) -> jax.Array:
        b, t, h, w, c = x.shape
        src_w = flows_forward.shape[3]
        ff = _resize_flows(flows_forward, (h, w), src_w)
        fb = _resize_flows(flows_backward, (h, w), src_w)

        x_orig = x
        if self.mid_channels != self.in_channels:
            x = self.input_layer(x)

        feats_b = self._run_pass("backward_prop", x, ff, fb, interpolation,
                                 alpha1, alpha2, reverse=True)
        feats_f = self._run_pass("forward_prop", feats_b, fb, ff, interpolation,
                                 alpha1, alpha2, reverse=False)

        cat = jnp.concatenate([x, feats_b, feats_f], axis=-1)
        flat = cat.reshape(b * t, h, w, cat.shape[-1])
        fused = self.fuse(flat).reshape(b, t, h, w, self.mid_channels)
        if self.mid_channels != self.in_channels:
            fused = self.output_layer(fused)
        return fused + x_orig
