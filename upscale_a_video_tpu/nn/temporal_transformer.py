"""Optional temporal-transformer stack for TemporalModule3D
(ref `/root/reference/models_video/temporal_module.py:197-693`).

Inactive in the released config (``attention_block_types: ["", ""]``) but part
of the reference's capability surface: per-block spatial/temporal attention in
modes ``Temporal`` / ``Spatial`` / ``CrossFrame`` (KV concat of
{0, i-1, i, i+1} patterns, :471-496) / ``SpatialTemporalShift`` (TSM-style
channel shift on K/V, :498-512), AdaLayerNorm timestep conditioning
(:674-693), and an optional DCN/flow WarpModule (:582-671).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention
from ..ops.deform_conv import deform_conv2d
from ..ops.warp import grid_sample
from .attention import FeedForward, _merge_heads, _split_heads


class AdaLayerNorm(nn.Module):
    """Timestep-embedding-conditioned LayerNorm (ref :674-693)."""

    dim: int
    num_embeddings: int = 1000
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array) -> jax.Array:
        # x: (B', S, C); timestep: (B,) broadcast over B'/B repeats (ref :688)
        t = jnp.broadcast_to(
            jnp.repeat(jnp.asarray(timestep).reshape(-1),
                       x.shape[0] // max(jnp.asarray(timestep).reshape(-1).shape[0], 1)),
            (x.shape[0],),
        )
        emb = nn.Embed(self.num_embeddings, self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="emb")(t.astype(jnp.int32))
        emb = nn.Dense(self.dim * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(jax.nn.silu(emb))[:, None]
        scale, shift = jnp.split(emb, 2, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                              dtype=self.dtype, name="norm")(x)
        return normed * (1 + scale) + shift


def temporal_token_concat(x: jax.Array, video_length: int, mode: str) -> jax.Array:
    """KV token concat across frames (ref :471-496). x: (B·F, S, C)."""
    bf, s, c = x.shape
    b = bf // video_length
    t = x.reshape(b, video_length, s, c)
    cur = np.arange(video_length)
    former = np.maximum(cur - 1, 0)
    later = np.concatenate([cur[1:], [video_length - 1]])
    first = np.zeros_like(cur)

    if mode == "0_i-1":
        parts = [t[:, first], t[:, former]]
    elif mode == "i-1_i":
        parts = [t[:, former], t[:, cur]]
    elif mode == "0_i-1_i":
        parts = [t[:, first], t[:, former], t[:, cur]]
    elif mode == "i-1_i_i+1":
        parts = [t[:, former], t[:, cur], t[:, later]]
    elif mode is None:
        return x
    else:
        raise NotImplementedError(mode)
    out = jnp.concatenate(parts, axis=2)
    return out.reshape(bf, -1, c)


def temporal_shift(x: jax.Array, video_length: int, fold_div: int = 2,
                   direction: str = "right") -> jax.Array:
    """TSM-style channel shift on K/V (ref :498-512)."""
    if direction != "right":
        raise NotImplementedError(direction)
    bf, s, c = x.shape
    b = bf // video_length
    t = x.reshape(b, video_length, s, c)
    fold = c // fold_div
    shifted = jnp.concatenate(
        [jnp.zeros_like(t[:, :1, :, :fold]), t[:, :-1, :, :fold]], axis=1
    )
    out = jnp.concatenate([shifted, t[..., fold:]], axis=-1)
    return out.reshape(bf, s, c)


class VersatileSelfAttention(nn.Module):
    """Self-attention with mode-dependent KV preprocessing (ref :443-579).
    Input (B·F, S, C) per-frame tokens; ``Temporal`` mode reshapes to
    per-pixel frame sequences internally."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    attention_mode: Optional[str] = None  # Temporal|Spatial|CrossFrame|SpatialTemporalShift|None
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    temporal_shift_direction: str = "right"
    zero_init_out: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, video_length: int) -> jax.Array:
        mode = self.attention_mode
        x = hidden_states
        if mode == "Temporal":
            bf, d, c = x.shape
            b = bf // video_length
            x = x.reshape(b, video_length, d, c).transpose(0, 2, 1, 3)
            x = x.reshape(b * d, video_length, c)

        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(x)

        if mode == "SpatialTemporalShift":
            k = temporal_shift(k, video_length, self.temporal_shift_fold_div,
                               self.temporal_shift_direction)
            v = temporal_shift(v, video_length, self.temporal_shift_fold_div,
                               self.temporal_shift_direction)
        elif mode == "CrossFrame":
            k = temporal_token_concat(k, video_length, self.cross_frame_attention_mode)
            v = temporal_token_concat(v, video_length, self.cross_frame_attention_mode)

        qh = _split_heads(q, self.heads)
        kh = _split_heads(k, self.heads)
        vh = _split_heads(v, self.heads)
        out = attention(qh, kh, vh, scale=self.dim_head**-0.5)
        out = _merge_heads(out)

        out_init = (nn.initializers.zeros_init() if self.zero_init_out
                    else nn.initializers.lecun_normal())
        out = nn.Dense(self.query_dim, kernel_init=out_init, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="to_out_0")(out)

        if mode == "Temporal":
            bd = out.shape[0]
            b = bd // d
            out = out.reshape(b, d, video_length, self.query_dim).transpose(0, 2, 1, 3)
            out = out.reshape(b * video_length, d, self.query_dim)
        return out


class WarpModule(nn.Module):
    """DCN- or flow-based warp of hidden states (ref :582-671)."""

    in_channels: int
    use_deformable_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, offset_hidden_states: jax.Array) -> jax.Array:
        b, s, c = hidden_states.shape
        size = int(round(s**0.5))
        assert size * size == s, "WarpModule expects square token grids"
        x = hidden_states.reshape(b, size, size, c)
        off_in = offset_hidden_states.reshape(b, size, size, c)
        cat = jnp.concatenate([x, off_in], axis=-1)

        if self.use_deformable_conv:
            conv_out = nn.Conv(27, (3, 3), padding="SAME", dtype=self.dtype,
                               param_dtype=self.param_dtype, name="conv")(cat)
            ox, oy, mask = jnp.split(conv_out, 3, axis=-1)
            mask = jax.nn.sigmoid(mask) * 2
            offsets = jnp.concatenate([ox, oy], axis=-1)
            weight = self.param(
                "dcn_weight",
                nn.initializers.normal(1.0 / np.sqrt(self.in_channels * 9)),
                (3, 3, self.in_channels, self.in_channels), self.param_dtype,
            )
            alpha = self.param("alpha", nn.initializers.zeros_init(),
                               (1, 1, 1, self.in_channels), self.param_dtype)
            warped = deform_conv2d(x, offsets, weight, mask=mask, padding=1)
            out = alpha * warped + x
        else:
            offsets = nn.Conv(2, (3, 3), padding="SAME",
                              kernel_init=nn.initializers.zeros_init(),
                              bias_init=nn.initializers.zeros_init(),
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="conv")(cat)
            out = self._flow_warp_masked(x, offsets)
        return out.reshape(b, s, c)

    @staticmethod
    def _flow_warp_masked(x: jax.Array, flow: jax.Array) -> jax.Array:
        """ref optical_flow_warping (:632-671): align_corners=True bilinear
        warp with the reference's (buggy but replicated) warped-value mask."""
        b, h, w, c = x.shape
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        gx = 2.0 * (xx + flow[..., 0]) / max(w - 1, 1) - 1.0
        gy = 2.0 * (yy + flow[..., 1]) / max(h - 1, 1) - 1.0
        grid = jnp.stack([gx, gy], axis=-1)
        out = grid_sample(x.astype(jnp.float32), grid, "bilinear", "zeros", True)
        # NB: the reference overwrites its ones-mask with a second warp of x
        # (:663-664), then thresholds — we reproduce that behavior exactly.
        mask = grid_sample(x.astype(jnp.float32), grid, "bilinear", "zeros", True)
        mask = jnp.where(mask < 0.9999, 0.0, 1.0)
        return (out * mask).astype(x.dtype)


class TemporalTransformerBlock(nn.Module):
    """ref :322-440: optional spatial attention → temporal attention (or DCN
    warp driven by it) → feed-forward; AdaLayerNorm when num_embeds set."""

    dim: int
    heads: int
    dim_head: int
    attention_block_types: Tuple[str, str] = ("Temporal", "Temporal")
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    temporal_shift_direction: str = "right"
    num_embeds_ada_norm: Optional[int] = 1000
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, timestep, video_length: int) -> jax.Array:
        def norm(name):
            if self.num_embeds_ada_norm is not None:
                ada = AdaLayerNorm(self.dim, self.num_embeds_ada_norm,
                                   dtype=self.dtype, param_dtype=self.param_dtype,
                                   name=name)
                return lambda x: ada(x, timestep)
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name=name)
            return ln

        if self.attention_block_types[0] != "":
            h = norm("norm1")(hidden_states)
            hidden_states = VersatileSelfAttention(
                query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                attention_mode=self.attention_block_types[0],
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                temporal_shift_fold_div=self.temporal_shift_fold_div,
                temporal_shift_direction=self.temporal_shift_direction,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn_spatial",
            )(h, video_length) + hidden_states

        h = norm("norm2")(hidden_states)
        attn_out = VersatileSelfAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            attention_mode=self.attention_block_types[1] or None,
            cross_frame_attention_mode=self.cross_frame_attention_mode,
            temporal_shift_fold_div=self.temporal_shift_fold_div,
            temporal_shift_direction=self.temporal_shift_direction,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn_temporal",
        )(h, video_length)
        if self.use_dcn_warpping:
            hidden_states = WarpModule(
                self.dim, self.use_deformable_conv, dtype=self.dtype,
                param_dtype=self.param_dtype, name="dcn_module",
            )(hidden_states, attn_out)
        else:
            hidden_states = attn_out + hidden_states

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm3")(hidden_states)
        return FeedForward(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                           name="ff")(h) + hidden_states


class TemporalTransformer3DModel(nn.Module):
    """ref :197-319: GN → proj_in → blocks → proj_out, residual.
    Input (B, T, H, W, C)."""

    heads: int
    dim_head: int
    in_channels: int
    num_layers: int = 1
    norm_num_groups: int = 8
    attention_block_types: Tuple[str, str] = ("Temporal", "Temporal")
    cross_frame_attention_mode: Optional[str] = None
    num_embeds_ada_norm: Optional[int] = 1000
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep) -> jax.Array:
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        residual = x

        flat = x.reshape(b * t, hh, ww, c)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm")(flat)
        tokens = h.reshape(b * t, hh * ww, c)
        tokens = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj_in")(tokens)

        for i in range(self.num_layers):
            tokens = TemporalTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                attention_block_types=self.attention_block_types,
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                num_embeds_ada_norm=self.num_embeds_ada_norm,
                use_dcn_warpping=self.use_dcn_warpping,
                use_deformable_conv=self.use_deformable_conv,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(tokens, timestep, t)

        tokens = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj_out")(tokens)
        return tokens.reshape(b, t, hh, ww, c) + residual
