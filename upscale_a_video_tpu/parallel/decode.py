"""Sharded VAE decode: distribute the reference's 3-frame decode chunks.

The reference decodes latents serially in 3-frame chunks in fp32
(ref pipeline_upscale_a_video.py:668,685-700). The chunks are independent
programs over disjoint frames (the decoder's temporal coupling — GroupNorm
stats over (T,H,W), temporal convs in the video VAE — acts *within* a chunk,
which is why the chunk partition is semantics-bearing and must be preserved).
That makes them a perfect data-parallel axis:

- the ``T // chunk`` full chunks are dealt round-robin to the mesh; each chip
  decodes its share in one batched call;
- one ``all_gather`` over ICI reassembles the 4×-upscaled frames;
- a short remainder chunk (T % chunk ≠ 0) is decoded replicated on every chip
  — cheaper than any special-case collective and bit-identical to the serial
  tail decode.

Equals the serial chunked decode exactly (tests/test_sharded_decode.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def build_sharded_decode(
    vae,
    mesh: Mesh,
    num_frames: int,
    chunk: int = 3,
    axis: str = "win",
    decode_dtype=jnp.float32,
    w_lr: float = 1.0,
):
    """Returns jitted ``decode(vae_params, latents, image_dec) -> video`` with
    latents/image replicated, (B, T, H, W, C) → (B, T, 4H, 4W, 3) in [-1, 1].
    """
    n_dev = mesh.shape[axis]
    scaling = vae.config.scaling_factor
    cond = vae.config.condition_img
    n_full = num_frames // chunk
    rem = num_frames - n_full * chunk
    cpd = max(1, -(-n_full // n_dev))  # chunks per device (≥1 dummy if T<chunk)

    def run_chunks(vae_params, z, img, nb, length):
        """Decode (N, B, length, ...) chunk stacks as one batched call."""
        n = z.shape[0]
        zf = z.reshape(n * nb, length, *z.shape[3:])
        imgf = img.reshape(n * nb, length, *img.shape[3:]) if cond else None
        out = vae.apply(vae_params, zf, method=vae.decode, img=imgf, w_lr=w_lr)
        out = jnp.clip(out, -1.0, 1.0)  # ref decode_latents_vsr :350-354
        return out.reshape(n, nb, *out.shape[1:])  # (N, B, length, 4H, 4W, 3)

    def local_decode(vae_params, latents, image_dec):
        nb, t = latents.shape[0], latents.shape[1]
        z = (latents / scaling).astype(decode_dtype)
        img = image_dec.astype(decode_dtype)

        rank = jax.lax.axis_index(axis)
        # this chip's chunk ids, clamped so padding re-decodes chunk 0
        ids = jnp.clip(rank * cpd + jnp.arange(cpd), 0, max(n_full - 1, 0))
        frame_idx = ids[:, None] * chunk + jnp.arange(chunk)[None, :]

        parts = []
        if n_full > 0:
            zc = jnp.moveaxis(z[:, frame_idx], 0, 1)      # (cpd, B, chunk, ...)
            ic = jnp.moveaxis(img[:, frame_idx], 0, 1)
            out_local = run_chunks(vae_params, zc, ic, nb, chunk)
            gathered = jax.lax.all_gather(out_local, axis)  # (n_dev, cpd, ...)
            gathered = gathered.reshape(n_dev * cpd, *out_local.shape[1:])
            full = gathered[:n_full]                       # drop padding
            full = jnp.moveaxis(full, 0, 1)                # (B, n_full, chunk, ...)
            parts.append(full.reshape(nb, n_full * chunk, *full.shape[3:]))
        if rem:
            tail = run_chunks(
                vae_params,
                z[None, :, n_full * chunk:], img[None, :, n_full * chunk:],
                nb, rem)[0]
            parts.append(tail)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    sharded = shard_map(
        local_decode, mesh=mesh,
        in_specs=(P(), P(), P()), out_specs=P(),
        check_rep=False,
    )
    return jax.jit(sharded)
