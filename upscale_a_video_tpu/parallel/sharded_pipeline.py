"""Time-sharded denoise pipeline: the full denoising loop with the frame axis
distributed over a mesh (BASELINE config #5: long-video batched eval with
temporal-chunk sharding over ICI).

The whole loop runs inside ONE ``shard_map``-under-``jit`` program: each chip
holds T/N frames of latents and noised LR frames; the per-step UNet windows are
computed chunk-locally with a ppermute halo/spill exchange that reproduces the
serial window plan exactly (parallel/temporal.windowed_apply_local); the DDIM
split-step update is elementwise per frame and needs no communication.

Propagation (`-p`) is frame-sequential (SURVEY §5.7 hard part #4) and stays
bit-identical to the serial plan: the recurrence is pipelined across the
mesh with single-frame boundary ``ppermute``s (parallel/propagation.py) —
2·(N−1) boundary frames on the wire per propagation step instead of the
previous full-clip time-axis all-gather, an L× (frames-per-chip) volume
reduction (ref pipeline_upscale_a_video.py:652-657 applies propagation at a
handful of selected steps only).
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
    propagation_steps=(),
    pab=None,
):
    """Returns jitted ``denoise(params, latents, image_noised, prompt_embeds,
    denoise_level[, flows_f, flows_b]) -> latents`` with latents/image sharded
    on the frame axis.

    latents: (B, T, H, W, 4); image_noised: (CFG·B, T, H, W, 3) — both sharded
    P(None, axis); everything else replicated. With ``propagation_steps`` the
    returned fn takes the bidirectional flows (replicated, full T) and applies
    flow-guided propagation to x0 at those step indices via a time-axis
    all-gather (see module docstring). With ``pab`` (a PABConfig) the
    per-window attention caches ride the scan carry chip-locally — every
    global window is owned by one chip, so broadcasting costs no
    communication, and the per-chip cache shrinks ~1/N (full-level caching
    fits where the single-chip run must skip levels).
    """
    from .propagation import distributed_propagate_latents
    from .temporal import local_window_count

    n_chunks = mesh.shape[axis]
    do_cfg = guidance_scale > 1.0
    timesteps = jnp.asarray(scheduler.timesteps(num_inference_steps))
    do_prop = bool(propagation_steps)
    prop_flags = jnp.asarray(
        [i in set(propagation_steps) for i in range(num_inference_steps)])
    if pab is not None:
        pab_flag_arrays = pab.use_cached_flags(num_inference_steps)
        pab_flags = {k: jnp.asarray(v) for k, v in pab_flag_arrays.items()}
        collect_struct = unet.make_pab_collect_cache(
            skip=pab.skip_levels,
            kinds=(None if set(pab.kinds) == {"spatial", "cross", "temporal"}
                   else pab.kinds))

    def local_denoise(params, latents, image_noised, prompt_embeds, denoise_level,
                      flows_f=None, flows_b=None):
        t_local = latents.shape[1]

        def propagate_local(x0):
            return distributed_propagate_latents(
                x0, flows_f, flows_b, axis, n_chunks)

        def body(carry, step_in):
            if pab is not None:
                lat, caches = carry
                tstep, prop_now, f_cross, f_spatial, f_temporal = step_in
                flags = {"cross": f_cross, "spatial": f_spatial,
                         "temporal": f_temporal}
            else:
                lat = carry
                tstep, prop_now = step_in
            latent_in = jnp.concatenate([lat, lat]) if do_cfg else lat

            def win_fn(xs, cache=None):
                lat_w, img_w = xs
                if cache is None:
                    return unet.apply(params, lat_w.astype(compute_dtype), tstep,
                                      img_w.astype(compute_dtype), prompt_embeds,
                                      denoise_level)
                return unet.apply(params, lat_w.astype(compute_dtype), tstep,
                                  img_w.astype(compute_dtype), prompt_embeds,
                                  denoise_level, attn_cache=cache,
                                  use_flags=flags)

            if pab is not None:
                noise_pred, caches = windowed_apply_local(
                    win_fn, (latent_in, image_noised), axis, n_chunks, window,
                    stride, caches=caches)
            else:
                noise_pred = windowed_apply_local(
                    win_fn, (latent_in, image_noised), axis, n_chunks, window,
                    stride)
            noise_pred = noise_pred.astype(jnp.float32)
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            x0 = scheduler.step_v0(noise_pred, tstep, lat)
            if do_prop:
                x0 = jax.lax.cond(prop_now, propagate_local, lambda v: v, x0)
            lat = scheduler.step_vt(x0, noise_pred, tstep, lat,
                                    num_inference_steps)
            if pab is not None:
                return (lat, caches), ()
            return lat, ()

        if pab is not None:
            # zero-init per-window caches from the collected structure
            bc = (2 if do_cfg else 1) * latents.shape[0]
            cache_shapes = jax.eval_shape(
                lambda p: unet.apply(
                    p, jnp.zeros((bc, window) + latents.shape[2:], compute_dtype),
                    jnp.int32(0),
                    jnp.zeros((bc, window) + image_noised.shape[2:], compute_dtype),
                    prompt_embeds, denoise_level,
                    attn_cache=collect_struct,
                    use_flags={"cross": False, "spatial": False,
                               "temporal": False})[1],
                params)
            zero_cache = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                      cache_shapes)
            n_local = local_window_count(t_local, n_chunks, window, stride)
            caches0 = [zero_cache] * n_local
            step_in = (timesteps, prop_flags, pab_flags["cross"],
                       pab_flags["spatial"], pab_flags["temporal"])
            (latents, _), _ = jax.lax.scan(body, (latents, caches0), step_in)
            return latents

        latents, _ = jax.lax.scan(body, latents, (timesteps, prop_flags))
        return latents

    if do_prop:
        in_specs = (P(), P(None, axis), P(None, axis), P(), P(), P(), P())
    else:
        in_specs = (P(), P(None, axis), P(None, axis), P(), P())
    sharded = shard_map(
        local_denoise,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None, axis),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def shard_video(x, mesh: Mesh, axis: str = "time"):
    """Place a (B, T, ...) array with the frame axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis)))
