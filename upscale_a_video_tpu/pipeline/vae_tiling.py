"""VAE-level tiled encode/decode with seam blending
(ref autoencoder_kl_cond_video.py:228-333).

Reference semantics reproduced exactly:
- tiled_encode: 256px sample tiles with 25% overlap (overlap stride 192),
  encoded tiles seam-blended in latent space over 16 rows/cols, cropped to 48.
- tiled_decode: the reference *overrides* its own tiling constants
  (:301-303): non-overlapping 256-latent tiles, decoded with the matching LR
  condition crops, then crossfaded over 64·4 px at the seams (its blend_extent
  stays the one derived from the sample size).

Blend loops become precomputed linear ramps (vectorized, jit-friendly).
Channels-last: x (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _blend_v(a: jax.Array, b: jax.Array, blend_extent: int) -> jax.Array:
    """Crossfade the top `be` rows of b with the bottom `be` rows of a
    (ref :228-231). a/b: (B, T, H, W, C)."""
    be = min(a.shape[2], b.shape[2], blend_extent)
    if be <= 0:
        return b
    ramp = (jnp.arange(be, dtype=jnp.float32) / blend_extent)[None, None, :, None, None]
    # row y of b blends with row (-blend_extent + y) of a (ref :230)
    top = a[:, :, a.shape[2] - blend_extent: a.shape[2] - blend_extent + be]
    blended = top * (1.0 - ramp) + b[:, :, :be] * ramp
    return jnp.concatenate([blended.astype(b.dtype), b[:, :, be:]], axis=2)


def _blend_h(a: jax.Array, b: jax.Array, blend_extent: int) -> jax.Array:
    """Crossfade the left `be` cols of b with the right `be` cols of a
    (ref :233-236)."""
    be = min(a.shape[3], b.shape[3], blend_extent)
    if be <= 0:
        return b
    ramp = (jnp.arange(be, dtype=jnp.float32) / blend_extent)[None, None, None, :, None]
    left = a[:, :, :, a.shape[3] - blend_extent: a.shape[3] - blend_extent + be]
    blended = left * (1.0 - ramp) + b[:, :, :, :be] * ramp
    return jnp.concatenate([blended.astype(b.dtype), b[:, :, :, be:]], axis=3)


def tiled_encode_moments(
    encode_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    tile_sample_min_size: int = 256,
    tile_latent_min_size: int = 64,
    tile_overlap_factor: float = 0.25,
) -> jax.Array:
    """Tiled encoder → gaussian moments (ref tiled_encode :238-283).

    encode_fn: full (non-tiled) encode to moments, (B,T,h',w',2L).
    """
    overlap_size = int(tile_sample_min_size * (1 - tile_overlap_factor))
    blend_extent = int(tile_latent_min_size * tile_overlap_factor)
    row_limit = tile_latent_min_size - blend_extent

    rows = []
    for i in range(0, x.shape[2], overlap_size):
        row = []
        for j in range(0, x.shape[3], overlap_size):
            tile = x[:, :, i: i + tile_sample_min_size, j: j + tile_sample_min_size]
            row.append(encode_fn(tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :, :row_limit, :, :][:, :, :, :row_limit, :])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def tiled_decode(
    decode_fn: Callable[[jax.Array, Optional[jax.Array]], jax.Array],
    z: jax.Array,
    img: Optional[jax.Array] = None,
    tile_latent_size: int = 256,
    blend_extent: int = 64,
    scale: int = 4,
) -> jax.Array:
    """Tiled conditional decoder (ref tiled_decode :285-333): non-overlapping
    `tile_latent_size` latent tiles (the reference's :301-303 override),
    crossfaded at the seams over `blend_extent` output pixels.

    decode_fn(z_tile, img_tile) → decoded tile at ×scale.
    """
    overlap_size = tile_latent_size
    row_limit = tile_latent_size * scale

    rows = []
    for i in range(0, z.shape[2], overlap_size):
        row = []
        for j in range(0, z.shape[3], overlap_size):
            tile = z[:, :, i: i + tile_latent_size, j: j + tile_latent_size]
            img_tile = None
            if img is not None:
                img_tile = img[:, :, i: i + tile_latent_size, j: j + tile_latent_size]
            row.append(decode_fn(tile, img_tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :, :row_limit, :, :][:, :, :, :row_limit, :])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)
