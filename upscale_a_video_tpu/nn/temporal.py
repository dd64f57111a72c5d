"""Temporal adapter modules inserted after every UNet spatial block.

Mirrors `/root/reference/models_video/temporal_module.py:98-194`. In the
released config (``temporal_module_config.attention_block_types = ["", ""]``)
the module is purely convolutional: a (5,1,1) temporal resblock, a spatial
resblock, and a zero-initialized 1×1 "shift" conv residual gate
``out = x + f(x) * w``. The optional temporal-transformer variants
(Temporal/Spatial/CrossFrame/TemporalShift modes, temporal_module.py:197-579)
are intentionally not replicated — they are dead in the released model; the
same capability is covered by TemporalAttention in the transformer blocks.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import InflatedConv, ResnetBlock3D, ResnetBlock3DCNN


class TemporalModule3D(nn.Module):
    """3D-CNN temporal residual adapter with zero-init gate
    (ref temporal_module.py:98-194)."""

    in_channels: int
    temb_channels: Optional[int] = None
    use_scale_shift: bool = False
    groups: int = 32  # fixed at 32 in the reference (temporal_module.py:138)
    # optional temporal transformer (off in the released config, ref :120,141)
    attention_block_types: tuple = ("", "")
    num_attention_heads: int = 8
    attention_dim_div: int = 2
    cross_frame_attention_mode: Optional[str] = None
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        temb: Optional[jax.Array] = None,
        w: float = 1.0,
        timesteps=None,
    ) -> jax.Array:
        x = hidden_states
        h = ResnetBlock3DCNN(
            in_channels=self.in_channels, temporal_kernel=(5, 1, 1),
            temb_channels=self.temb_channels, groups=self.groups, groups_out=self.groups,
            dtype=self.dtype, param_dtype=self.param_dtype, name="resblocks_3d_temporal",
        )(x, temb)
        h = ResnetBlock3D(
            in_channels=self.in_channels, temb_channels=self.temb_channels,
            groups=self.groups, groups_out=self.groups, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resblocks_3d_spatial",
        )(h, temb)

        if self.attention_block_types[0] != "" or self.attention_block_types[1] != "":
            from .temporal_transformer import TemporalTransformer3DModel

            head_dim = self.in_channels // self.num_attention_heads // self.attention_dim_div
            h = TemporalTransformer3DModel(
                heads=self.num_attention_heads, dim_head=head_dim,
                in_channels=self.in_channels, num_layers=1,
                norm_num_groups=min(8, self.groups),
                attention_block_types=tuple(self.attention_block_types),
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                use_dcn_warpping=self.use_dcn_warpping,
                use_deformable_conv=self.use_deformable_conv,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attentions_0",
            )(h, timesteps if timesteps is not None else 0)

        if self.use_scale_shift:
            ss = InflatedConv(
                self.in_channels * 2, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
                name="scale_shift_conv",
            )
            # zero-init handled by converter; at fresh init flax default applies
            h = ss(h)
            scale, shift = jnp.split(h, 2, axis=-1)
            return (1 + scale) * x + shift

        h = InflatedConvZero(self.in_channels, name="shift_conv", dtype=self.dtype,
                             param_dtype=self.param_dtype)(h)
        return x + h * w


class InflatedConvZero(nn.Module):
    """Inflated conv with zero-initialized weights (residual gates)."""

    features: int
    kernel_size: tuple = (1, 1)
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t = x.shape[0], x.shape[1]
        flat = x.reshape(b * t, *x.shape[2:])
        out = nn.Conv(
            self.features, self.kernel_size,
            padding="SAME",
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(flat)
        return out.reshape(b, t, *out.shape[1:])


class TemporalModule3DVAE(nn.Module):
    """Temporal residual adapter for the video VAE decoder
    (ref temporal_module.py:63-94). Note: the released video-VAE decoder only
    stores the ``use_temporal_block`` flag (vae_video.py:280,302-304) — its
    temporality comes from ResnetBlock3DPlus — but the module is provided for
    config parity."""

    in_channels: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, w: float = 1.0) -> jax.Array:
        h = ResnetBlock3DCNN(
            in_channels=self.in_channels, temporal_kernel=(3, 1, 1), temb_channels=None,
            dtype=self.dtype, param_dtype=self.param_dtype, name="resblocks_3d_temporal",
        )(hidden_states)
        h = InflatedConvZero(self.in_channels, kernel_size=(3, 3), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="resblocks_3d_spatial")(h)
        return hidden_states + h * w
