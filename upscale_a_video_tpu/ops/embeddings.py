"""Sinusoidal timestep embeddings.

Matches diffusers' ``get_timestep_embedding`` as used by the reference UNet's
``Timesteps`` module (ref unet_video.py:173 with flip_sin_to_cos=True,
freq_shift=0 from configs/unet_video_config.json).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """timesteps: (B,) int/float array → (B, embedding_dim) float32."""
    assert timesteps.ndim == 1, "timesteps must be a 1-D batch of scalars"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
