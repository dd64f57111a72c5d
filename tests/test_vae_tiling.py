"""Tiled VAE encode/decode vs a direct torch-style simulation of the reference
loops (autoencoder_kl_cond_video.py:228-333) using a stand-in "encoder"."""

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.pipeline.vae_tiling import (
    _blend_h,
    _blend_v,
    tiled_decode,
    tiled_encode_moments,
)


def np_blend_v(a, b, blend_extent):
    b = b.copy()
    for y in range(min(a.shape[2], b.shape[2], blend_extent)):
        b[:, :, y] = a[:, :, -blend_extent + y] * (1 - y / blend_extent) + \
            b[:, :, y] * (y / blend_extent)
    return b


def np_blend_h(a, b, blend_extent):
    b = b.copy()
    for x in range(min(a.shape[3], b.shape[3], blend_extent)):
        b[:, :, :, x] = a[:, :, :, -blend_extent + x] * (1 - x / blend_extent) + \
            b[:, :, :, x] * (x / blend_extent)
    return b


def test_blend_matches_reference_loops():
    rng = np.random.RandomState(0)
    a = rng.rand(1, 2, 16, 16, 3).astype(np.float32)
    b = rng.rand(1, 2, 16, 16, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_blend_v(jnp.asarray(a), jnp.asarray(b), 4)),
        np_blend_v(a, b, 4), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(_blend_h(jnp.asarray(a), jnp.asarray(b), 4)),
        np_blend_h(a, b, 4), atol=1e-6)
    # partial blend (be > available rows)
    b_small = rng.rand(1, 2, 3, 16, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_blend_v(jnp.asarray(a), jnp.asarray(b_small), 4)),
        np_blend_v(a, b_small, 4), atol=1e-6)


def fake_encode(x):
    """Stand-in 'encoder': /4 average pooling, 2 channels out — local op so
    tiling with overlap reproduces the untiled result away from seams."""
    b, t, h, w, c = x.shape
    y = x.reshape(b, t, h // 4, 4, w // 4, 4, c).mean(axis=(3, 5))
    return jnp.concatenate([y, y], axis=-1)[..., :2]


def test_tiled_encode_shape_and_interior():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 1, 96, 96, 1).astype(np.float32))
    moments = tiled_encode_moments(
        fake_encode, x, tile_sample_min_size=64, tile_latent_min_size=16,
        tile_overlap_factor=0.25,
    )
    full = fake_encode(x)
    assert moments.shape == full.shape
    # interior of the first tile (rows < row_limit=12, away from seams) is exact
    np.testing.assert_allclose(np.asarray(moments)[:, :, :8, :8],
                               np.asarray(full)[:, :, :8, :8], atol=1e-6)


def fake_decode(z, img):
    b, t, h, w, c = z.shape
    up = jnp.repeat(jnp.repeat(z, 4, axis=2), 4, axis=3)
    out = jnp.concatenate([up, up, up], axis=-1)[..., :3]
    if img is not None:
        out = out + jnp.repeat(jnp.repeat(img, 4, axis=2), 4, axis=3)[..., :3] * 0.1
    return out


def test_tiled_decode_shape_and_interior():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.rand(1, 1, 64, 64, 1).astype(np.float32))
    img = jnp.asarray(rng.rand(1, 1, 64, 64, 3).astype(np.float32))
    out = tiled_decode(fake_decode, z, img, tile_latent_size=32, blend_extent=8)
    full = fake_decode(z, img)
    assert out.shape == full.shape
    # non-overlapping tiles: away from the seam rows/cols output is exact
    np.testing.assert_allclose(np.asarray(out)[:, :, :120, :120],
                               np.asarray(full)[:, :, :120, :120], atol=1e-6)
