"""Sharded chunked VAE decode must equal the serial 3-frame chunk loop
(ref pipeline_upscale_a_video.py:685-700) exactly, including the short tail
chunk and the image-conditioned (video VAE) path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from upscale_a_video_tpu.config import VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo
from upscale_a_video_tpu.parallel.decode import build_sharded_decode
from upscale_a_video_tpu.pipeline.windows import chunk_starts

TINY = VaeConfig(
    block_out_channels=(8, 16, 16), norm_num_groups=4, latent_channels=4,
)
TINY_COND = VaeConfig(
    block_out_channels=(8, 16, 16), norm_num_groups=4, latent_channels=4,
    condition_img=True, condition_channels=8,
    up_block_types=("UpDecoderBlock3D_plus",) * 3,
)


def serial_decode(vae, params, latents, image_dec, chunk=3, w_lr=1.0):
    scaling = vae.config.scaling_factor
    outs = []
    for (s, e) in chunk_starts(latents.shape[1], chunk):
        z = (latents[:, s:e] / scaling).astype(jnp.float32)
        img = image_dec[:, s:e].astype(jnp.float32) if vae.config.condition_img else None
        out = vae.apply(params, z, method=vae.decode, img=img, w_lr=w_lr)
        outs.append(jnp.clip(out, -1.0, 1.0))
    return np.asarray(jnp.concatenate(outs, axis=1))


@pytest.mark.parametrize("cfg,t,n_dev", [
    (TINY, 9, 4),        # exact multiple of the chunk
    (TINY, 8, 8),        # tail chunk of 2, more devices than full chunks
    (TINY_COND, 7, 4),   # conditioned decoder + tail chunk of 1
    (TINY, 2, 4),        # clip shorter than one chunk
])
@pytest.mark.slow
def test_sharded_decode_matches_serial(cfg, t, n_dev):
    vae = AutoencoderKLVideo(cfg)
    b, h, w = 1, 8, 8
    if cfg.condition_img:
        enc = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, h, w, 3)),
                       method=vae.encode_moments)
        dec = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, h, w, 4)),
                       method=vae.decode, img=jnp.zeros((1, 1, h, w, 3)))
        params = {"params": {**enc["params"], **dec["params"]}}
    else:
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, h, w, 3)))
    latents = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, 4))
    image = jax.random.uniform(jax.random.PRNGKey(2), (b, t, h, w, 3),
                               minval=-1, maxval=1)

    want = serial_decode(vae, params, latents, image)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))
    decode = build_sharded_decode(vae, mesh, num_frames=t)
    got = np.asarray(decode(params, latents, image))
    assert got.shape == want.shape
    # Chunks are independent, so sharded ≡ serial up to compilation noise:
    # the shard_map program batches chunks (different conv batch extents →
    # different XLA reduction orders) and the decoder now runs the folded
    # subpixel upsampler-conv + bf16-operand mid attention, whose
    # recompiled reduction orders shift the noise floor to ~3e-5 abs.
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
