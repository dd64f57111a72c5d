"""Time-sharded denoise pipeline: the full denoising loop with the frame axis
distributed over a mesh (BASELINE config #5: long-video batched eval with
temporal-chunk sharding over ICI).

The whole loop runs inside ONE ``shard_map``-under-``jit`` program: each chip
holds T/N frames of latents and noised LR frames; the per-step UNet windows are
computed chunk-locally with a ppermute halo/spill exchange that reproduces the
serial window plan exactly (parallel/temporal.windowed_apply_local); the DDIM
split-step update is elementwise per frame and needs no communication.

Propagation (`-p`) is inherently frame-sequential and is not distributed here
(SURVEY §5.7 hard part #4); the sharded path covers the no-propagation eval
configs, which is where long-clip throughput matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .temporal import windowed_apply_local


def build_sharded_denoise(
    unet,
    scheduler,
    mesh: Mesh,
    num_inference_steps: int,
    guidance_scale: float,
    axis: str = "time",
    window: int = 8,
    stride: int = 6,
    compute_dtype=jnp.bfloat16,
):
    """Returns jitted ``denoise(params, latents, image_noised, prompt_embeds,
    denoise_level) -> latents`` with latents/image sharded on the frame axis.

    latents: (B, T, H, W, 4); image_noised: (CFG·B, T, H, W, 3) — both sharded
    P(None, axis); everything else replicated.
    """
    n_chunks = mesh.shape[axis]
    do_cfg = guidance_scale > 1.0
    timesteps = jnp.asarray(scheduler.timesteps(num_inference_steps))

    def local_denoise(params, latents, image_noised, prompt_embeds, denoise_level):
        def body(lat, tstep):
            latent_in = jnp.concatenate([lat, lat]) if do_cfg else lat

            def win_fn(xs):
                lat_w, img_w = xs
                return unet.apply(params, lat_w.astype(compute_dtype), tstep,
                                  img_w.astype(compute_dtype), prompt_embeds,
                                  denoise_level)

            noise_pred = windowed_apply_local(
                win_fn, (latent_in, image_noised), axis, n_chunks, window, stride
            ).astype(jnp.float32)
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            x0 = scheduler.step_v0(noise_pred, tstep, lat)
            lat = scheduler.step_vt(x0, noise_pred, tstep, lat,
                                    num_inference_steps)
            return lat, ()

        latents, _ = jax.lax.scan(body, latents, timesteps)
        return latents

    sharded = shard_map(
        local_denoise,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(), P()),
        out_specs=P(None, axis),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def shard_video(x, mesh: Mesh, axis: str = "time"):
    """Place a (B, T, ...) array with the frame axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis)))
