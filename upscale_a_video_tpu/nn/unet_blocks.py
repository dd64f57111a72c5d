"""Composite UNet and VAE blocks (ref `/root/reference/models_video/unet_blocks.py`).

Each block is a flax module over channels-last (B, T, H, W, C) video tensors.
Gradient checkpointing is applied at the model level with ``nn.remat`` rather
than per-block flags.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import SpatialAttentionBlock, Transformer3DModel
from .blocks import Downsample3D, ResnetBlock3D, ResnetBlock3DPlus, Upsample3D


class CrossAttnDownBlock3D(nn.Module):
    """num_layers × (resnet → transformer) + optional downsample
    (ref unet_blocks.py:270-388)."""

    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 1024
    downsample_padding: int = 1
    add_downsample: bool = True
    use_linear_projection: bool = True
    only_cross_attention: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states,
                 attn_caches=None, use_flags=None):
        want_cache = attn_caches is not None
        new_caches = []
        output_states = ()
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock3D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb)
            attn = Transformer3DModel(
                heads=self.attn_num_head_channels,
                dim_head=self.out_channels // self.attn_num_head_channels,
                in_channels=self.out_channels,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )
            if want_cache:
                hidden_states, c_i = attn(hidden_states, encoder_hidden_states,
                                          attn_caches[i], use_flags)
                new_caches.append(c_i)
            else:
                hidden_states = attn(hidden_states, encoder_hidden_states)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, param_dtype=self.param_dtype, name="downsamplers_0",
            )(hidden_states)
            output_states += (hidden_states,)

        if want_cache:
            return hidden_states, output_states, tuple(new_caches)
        return hidden_states, output_states


class DownBlock3D(nn.Module):
    """num_layers × resnet + optional downsample (ref unet_blocks.py:391-467)."""

    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    downsample_padding: int = 1
    add_downsample: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb):
        output_states = ()
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock3D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, param_dtype=self.param_dtype, name="downsamplers_0",
            )(hidden_states)
            output_states += (hidden_states,)

        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    """resnet → num_layers × (transformer → resnet) (ref unet_blocks.py:180-267)."""

    in_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states,
                 attn_caches=None, use_flags=None):
        want_cache = attn_caches is not None
        new_caches = []
        hidden_states = ResnetBlock3D(
            in_channels=self.in_channels, out_channels=self.in_channels,
            temb_channels=self.temb_channels, eps=self.resnet_eps,
            groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="resnets_0",
        )(hidden_states, temb)
        for i in range(self.num_layers):
            attn = Transformer3DModel(
                heads=self.attn_num_head_channels,
                dim_head=self.in_channels // self.attn_num_head_channels,
                in_channels=self.in_channels,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )
            if want_cache:
                hidden_states, c_i = attn(hidden_states, encoder_hidden_states,
                                          attn_caches[i], use_flags)
                new_caches.append(c_i)
            else:
                hidden_states = attn(hidden_states, encoder_hidden_states)
            hidden_states = ResnetBlock3D(
                in_channels=self.in_channels, out_channels=self.in_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i + 1}",
            )(hidden_states, temb)
        if want_cache:
            return hidden_states, tuple(new_caches)
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    """num_layers × (skip-concat → resnet → transformer) + optional upsample
    (ref unet_blocks.py:470-590)."""

    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 1024
    add_upsample: bool = True
    use_linear_projection: bool = True
    only_cross_attention: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb,
                 encoder_hidden_states, upsample_size=None,
                 attn_caches=None, use_flags=None):
        want_cache = attn_caches is not None
        new_caches = []
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if i == self.num_layers - 1 else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)

            hidden_states = ResnetBlock3D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb)
            attn = Transformer3DModel(
                heads=self.attn_num_head_channels,
                dim_head=self.out_channels // self.attn_num_head_channels,
                in_channels=self.out_channels,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )
            if want_cache:
                hidden_states, c_i = attn(hidden_states, encoder_hidden_states,
                                          attn_caches[i], use_flags)
                new_caches.append(c_i)
            else:
                hidden_states = attn(hidden_states, encoder_hidden_states)

        if self.add_upsample:
            hidden_states = Upsample3D(
                self.out_channels, use_conv=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name="upsamplers_0",
            )(hidden_states, upsample_size)
        if want_cache:
            return hidden_states, tuple(new_caches)
        return hidden_states


class UpBlock3D(nn.Module):
    """num_layers × (skip-concat → resnet) + optional upsample
    (ref unet_blocks.py:593-664)."""

    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    add_upsample: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, upsample_size=None):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if i == self.num_layers - 1 else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)

            hidden_states = ResnetBlock3D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, non_linearity=self.resnet_act_fn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb)

        if self.add_upsample:
            hidden_states = Upsample3D(
                self.out_channels, use_conv=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name="upsamplers_0",
            )(hidden_states, upsample_size)
        return hidden_states


# --------------------------------------------------------------------- VAE


class UNetMidBlock3D(nn.Module):
    """VAE mid block: resnet → (spatial attention → resnet) × num_layers
    (ref unet_blocks.py:666-745). ``plus=True`` uses ResnetBlock3DPlus
    (UNetMidBlock3D_plus, :862-941)."""

    in_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    add_attention: bool = True
    attn_num_head_channels: Optional[int] = None
    plus: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb=None):
        Block = ResnetBlock3DPlus if self.plus else ResnetBlock3D
        hidden_states = Block(
            in_channels=self.in_channels, out_channels=self.in_channels,
            temb_channels=None, eps=self.resnet_eps, groups=self.resnet_groups,
            non_linearity=self.resnet_act_fn, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_0",
        )(hidden_states, temb)
        for i in range(self.num_layers):
            if self.add_attention:
                hidden_states = SpatialAttentionBlock(
                    channels=self.in_channels,
                    num_head_channels=self.attn_num_head_channels,
                    norm_num_groups=self.resnet_groups, eps=self.resnet_eps,
                    dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
                )(hidden_states)
            hidden_states = Block(
                in_channels=self.in_channels, out_channels=self.in_channels,
                temb_channels=None, eps=self.resnet_eps, groups=self.resnet_groups,
                non_linearity=self.resnet_act_fn, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i + 1}",
            )(hidden_states, temb)
        return hidden_states


class DownEncoderBlock3D(nn.Module):
    """VAE encoder stage (ref unet_blocks.py:748-805)."""

    in_channels: int
    out_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-6
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    add_downsample: bool = True
    downsample_padding: int = 0
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock3D(
                in_channels=in_ch, out_channels=self.out_channels, temb_channels=None,
                eps=self.resnet_eps, groups=self.resnet_groups,
                non_linearity=self.resnet_act_fn, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, None)
        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, param_dtype=self.param_dtype, name="downsamplers_0",
            )(hidden_states)
        return hidden_states


class UpDecoderBlock3D(nn.Module):
    """VAE decoder stage (ref unet_blocks.py:808-859); ``plus=True`` uses
    ResnetBlock3DPlus (UpDecoderBlock3D_plus, :943-994)."""

    in_channels: int
    out_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-6
    resnet_act_fn: str = "silu"
    resnet_groups: int = 32
    add_upsample: bool = True
    plus: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        Block = ResnetBlock3DPlus if self.plus else ResnetBlock3D
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = Block(
                in_channels=in_ch, out_channels=self.out_channels, temb_channels=None,
                eps=self.resnet_eps, groups=self.resnet_groups,
                non_linearity=self.resnet_act_fn, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, None)
        if self.add_upsample:
            hidden_states = Upsample3D(
                self.out_channels, use_conv=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name="upsamplers_0",
            )(hidden_states)
        return hidden_states
