"""Training data pipeline: YouHQ-style clip sampling with real-world
degradations.

The reference releases no UAV training code; the paper (arXiv 2312.06640)
trains on YouHQ clips degraded with the RealBasicVSR recipe (blur → resize →
noise → compression). This module provides that synthesis pipeline as pure
jnp ops on device (blur/resize/noise) so the data path stays
host-decode → device-degrade, plus the batch assembly the train step
(training/train_unet.py) consumes.

All randomness from explicit threefry keys; every op is jit-able and batched
over clips.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_2d


def gaussian_blur(x: jax.Array, sigma: jax.Array, kernel_size: int = 21) -> jax.Array:
    """Depthwise Gaussian blur, per-clip sigma. x: (B, T, H, W, C); sigma (B,)."""
    b = x.shape[0]
    c = x.shape[-1]
    half = kernel_size // 2
    grid = jnp.arange(kernel_size, dtype=jnp.float32) - half

    def one(clip, s):
        k1 = jnp.exp(-(grid**2) / (2 * jnp.maximum(s, 1e-3) ** 2))
        k1 = k1 / k1.sum()
        k2 = k1[:, None] * k1[None, :]
        dw = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
        padded = jnp.pad(clip, ((0, 0), (half, half), (half, half), (0, 0)),
                         mode="edge")
        return jax.lax.conv_general_dilated(
            padded, dw, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    return jax.vmap(one)(x, sigma)


def add_gaussian_noise(key, x: jax.Array, sigma: jax.Array) -> jax.Array:
    """Per-clip noise level sigma (B,) in [0, 1] value units."""
    noise = jax.random.normal(key, x.shape, x.dtype)
    return x + noise * sigma[:, None, None, None, None]


def jpeg_like_artifacts(x: jax.Array, quality: jax.Array) -> jax.Array:
    """Cheap compression-artifact proxy: 8×8 blockwise DCT quantization is
    replaced by block-mean mixing — captures the blocking structure without a
    host JPEG codec. quality (B,) in [0,1]; 1 = no artifact."""
    b, t, h, w, c = x.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    xc = x[:, :, :h8, :w8]
    blocks = xc.reshape(b, t, h8 // 8, 8, w8 // 8, 8, c)
    means = blocks.mean(axis=(3, 5), keepdims=True)
    q = quality[:, None, None, None, None, None, None]
    mixed = q * blocks + (1 - q) * means
    out = mixed.reshape(b, t, h8, w8, c)
    return x.at[:, :, :h8, :w8].set(out)


def degrade_clip(
    key: jax.Array,
    hr: jax.Array,          # (B, T, 4h, 4w, 3) in [-1, 1]
    scale: int = 4,
    blur_sigma_range: Tuple[float, float] = (0.2, 3.0),
    noise_range: Tuple[float, float] = (0.0, 0.1),
    quality_range: Tuple[float, float] = (0.6, 1.0),
) -> jax.Array:
    """HR → degraded LR (B, T, h, w, 3): blur → ×1/scale resize → noise →
    compression artifacts (the first-order RealBasicVSR chain)."""
    b, t, hh, ww, _ = hr.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma = jax.random.uniform(k1, (b,), minval=blur_sigma_range[0],
                               maxval=blur_sigma_range[1])
    blurred = gaussian_blur(hr, sigma)
    lr = resize_2d(blurred, (hh // scale, ww // scale), "bilinear")
    nsig = jax.random.uniform(k2, (b,), minval=noise_range[0], maxval=noise_range[1])
    lr = add_gaussian_noise(k3, lr, nsig)
    qual = jax.random.uniform(k4, (b,), minval=quality_range[0],
                              maxval=quality_range[1])
    lr = jpeg_like_artifacts(lr, qual)
    return jnp.clip(lr, -1.0, 1.0)


def make_train_batch(
    key: jax.Array,
    hr_clips: jax.Array,      # (B, T, 4h, 4w, 3) in [-1, 1]
    vae_encode,               # callable: (B, T, 4h, 4w, 3) -> latents (B,T,h',w',4)
    text_embeds: jax.Array,   # (B, S, C)
    scaling_factor: float,
    scale: int = 4,
) -> Dict[str, jax.Array]:
    """Assemble the diffusion training batch (latents of HR, degraded LR
    condition, text embeddings) consumed by training.train_unet."""
    k_deg, _ = jax.random.split(key)
    low_res = degrade_clip(k_deg, hr_clips, scale=scale)
    latents = vae_encode(hr_clips) * scaling_factor
    return {"latents": latents, "low_res": low_res, "text_embeds": text_embeds}
