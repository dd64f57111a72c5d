"""Conditional video VAE (ref `/root/reference/models_video/autoencoder_kl_cond_video.py`
+ `vae_video.py`).

Two released configurations, both accepted via the reference JSONs:

- 3D VAE (vae_3d_config.json): plain UpDecoderBlock3D, no image condition.
- video VAE (vae_video_config.json): UpDecoderBlock3D_plus blocks with
  zero-init 3×3×3 temporal residual convs, plus an LR-image conditioning branch
  (2 × ResnetBlock3DPlus on the raw 3ch LR frames) fused into the decoder with
  an SFT block weighted by ``w_lr`` (vae_video.py:292-297,369-373).

The decoder has 3 up stages, two of which upsample ×2 → the overall ×4
super-resolution happens here, not in the UNet.

Tiled encode/decode with linear overlap blending
(autoencoder_kl_cond_video.py:238-333) lives in pipeline/tiling.py where it is
expressed as a batched tile grid rather than a Python loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VaeConfig
from ..nn.blocks import FuseSFTBlock, InflatedConv, ResnetBlock3DPlus
from ..nn.unet_blocks import DownEncoderBlock3D, UNetMidBlock3D, UpDecoderBlock3D


class Encoder(nn.Module):
    """(B,T,H,W,3) → (B,T,H/4,W/4,2*latent) moments (ref vae_video.py:55-156)."""

    config: VaeConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dt = self.dtype
        sample = InflatedConv(cfg.block_out_channels[0], (3, 3), dtype=dt,
                              param_dtype=self.param_dtype, name="conv_in")(x)

        output_channel = cfg.block_out_channels[0]
        for i, _ in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            sample = DownEncoderBlock3D(
                in_channels=input_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block, resnet_eps=1e-6,
                resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
                add_downsample=not is_final, downsample_padding=0,
                dtype=dt, param_dtype=self.param_dtype, name=f"down_blocks_{i}",
            )(sample)

        sample = UNetMidBlock3D(
            in_channels=cfg.block_out_channels[-1], resnet_eps=1e-6,
            resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
            attn_num_head_channels=None, plus=False,
            dtype=dt, param_dtype=self.param_dtype, name="mid_block",
        )(sample)

        sample = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=dt,
                              param_dtype=self.param_dtype, name="conv_norm_out")(sample)
        sample = jax.nn.silu(sample)
        sample = InflatedConv(2 * cfg.latent_channels, (3, 3), dtype=dt,
                              param_dtype=self.param_dtype, name="conv_out")(sample)
        return sample


class Decoder(nn.Module):
    """(B,T,h,w,latent) → (B,T,4h,4w,3), optionally conditioned on the LR
    frames ``img`` with weight ``w_lr`` (ref vae_video.py:264-405)."""

    config: VaeConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, img: Optional[jax.Array] = None,
                 w_lr: float = 1.0) -> jax.Array:
        cfg = self.config
        dt = self.dtype
        plus = cfg.is_plus

        sample = InflatedConv(cfg.block_out_channels[-1], (3, 3), dtype=dt,
                              param_dtype=self.param_dtype, name="conv_in")(z)

        if cfg.condition_img:
            assert img is not None, "decoder requires LR image condition (condition_img=True)"
            cond = ResnetBlock3DPlus(
                in_channels=3, out_channels=cfg.condition_channels, temb_channels=None,
                groups=3, groups_out=cfg.norm_num_groups, dtype=dt,
                param_dtype=self.param_dtype, name="condition_in_0",
            )(img)
            cond = ResnetBlock3DPlus(
                in_channels=cfg.condition_channels, out_channels=cfg.condition_channels,
                temb_channels=None, groups=min(32, cfg.norm_num_groups),
                groups_out=min(32, cfg.norm_num_groups), dtype=dt,
                param_dtype=self.param_dtype, name="condition_in_1",
            )(cond)
            sample = FuseSFTBlock(
                enc_channels=cfg.condition_channels, dec_channels=cfg.block_out_channels[-1],
                groups=min(32, cfg.norm_num_groups),
                dtype=dt, param_dtype=self.param_dtype, name="condition_fuse",
            )(cond, sample, w=w_lr)

        sample = UNetMidBlock3D(
            in_channels=cfg.block_out_channels[-1], resnet_eps=1e-6,
            resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
            attn_num_head_channels=None, plus=plus,
            dtype=dt, param_dtype=self.param_dtype, name="mid_block",
        )(sample)

        reversed_boc = list(reversed(cfg.block_out_channels))
        output_channel = reversed_boc[0]
        for i, _ in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_boc[i]
            is_final = i == len(cfg.block_out_channels) - 1
            sample = UpDecoderBlock3D(
                in_channels=prev_output_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block + 1, resnet_eps=1e-6,
                resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
                add_upsample=not is_final, plus=plus,
                dtype=dt, param_dtype=self.param_dtype, name=f"up_blocks_{i}",
            )(sample)

        sample = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=dt,
                              param_dtype=self.param_dtype, name="conv_norm_out")(sample)
        sample = jax.nn.silu(sample)
        sample = InflatedConv(cfg.out_channels, (3, 3), dtype=dt,
                              param_dtype=self.param_dtype, name="conv_out")(sample)
        return sample


class DiagonalGaussianDistribution:
    """Channels-last port of vae_video.py:407-451; moments split on the last axis."""

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        if self.deterministic:
            return self.mean
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0])
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )


class AutoencoderKLVideo(nn.Module):
    """Encoder + decoder + 1×1 quant convs (ref autoencoder_kl_cond_video.py:48-226)."""

    config: VaeConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        self.quant_conv = InflatedConv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        self.post_quant_conv = InflatedConv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """(B,T,H,W,3) → (B,T,h,w,2*latent) gaussian moments."""
        h = self.encoder(x)
        return self.quant_conv(h)

    def encode(self, x: jax.Array) -> DiagonalGaussianDistribution:
        return DiagonalGaussianDistribution(self.encode_moments(x))

    def decode(self, z: jax.Array, img: Optional[jax.Array] = None,
               w_lr: float = 1.0) -> jax.Array:
        z = self.post_quant_conv(z)
        return self.decoder(z, img, w_lr)

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None,
                 img: Optional[jax.Array] = None, w_lr: float = 1.0,
                 sample_posterior: bool = False) -> jax.Array:
        posterior = self.encode(x)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z, img, w_lr)
