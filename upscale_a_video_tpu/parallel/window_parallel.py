"""Window-parallel denoise: shard the UNet's temporal windows across chips.

The temporal-chunk scheme (parallel/temporal.py) needs ``T/N`` frames per chip
to be at least one window — it cannot shard the flagship workload geometry
(YouHQ40 clips are ~32 frames; 8 chips would leave 4 frames per chip). This
module shards the *work items* instead: the reference's sliding-window plan
(ref pipeline_upscale_a_video.py:601-635) yields ``n_win`` windows per step,
each run on the CFG·B batch — a (window × batch-element) grid of independent
UNet calls that the single-chip pipeline already batches through one blend
matrix (pipeline/windows.py). Here that item axis is sharded over the mesh:

- latents stay **replicated** (tiny next to UNet activations: 32 frames of
  320² 4-channel fp32 ≈ 52 MB);
- each chip gathers its items' frames, runs the UNet on its item batch, and
  contracts its predictions against its slice of the blend matrix;
- one ``psum`` over ICI rebuilds the blended noise prediction everywhere;
- the DDIM split-step (and flow propagation, when scheduled) runs replicated —
  elementwise math far cheaper than any collective that would avoid it.

Items are padded to a multiple of the mesh size with zero-blend dummies, so
any T ≥ 1 and any device count compile. Per step the only communication is the
(CFG·B, T, H, W, 4) psum, overlapped by XLA with the next step's gather.

Exact-plan equivalence vs. the serial reference loop is tested on an 8-device
CPU mesh at the real clip geometry (tests/test_window_parallel.py, T=32).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..pipeline.windows import unique_window_plan


def _item_plan(num_frames: int, batch: int, n_dev: int, window: int, stride: int):
    """Static item tables: item i = (window i//batch, batch element i%batch),
    padded with zero-weight dummies to a multiple of n_dev.

    Returns (win, item_start (P,), item_b (P,), item_blend (P, win, T),
    onehot_b (P, batch)) as numpy arrays.
    """
    # deduplicated plan (windows.unique_window_plan): repeated tail windows
    # collapse onto one work item — exact, and one fewer item to shard
    ustarts, blend = unique_window_plan(num_frames, window, stride)
    starts = np.asarray(ustarts)
    win = blend.shape[1]
    n_items = len(starts) * batch
    padded = -(-n_items // n_dev) * n_dev

    item_start = np.zeros(padded, np.int32)
    item_b = np.zeros(padded, np.int32)
    item_blend = np.zeros((padded, win, num_frames), np.float32)
    onehot = np.zeros((padded, batch), np.float32)
    for i in range(n_items):
        n, bi = divmod(i, batch)
        item_start[i] = starts[n]
        item_b[i] = bi
        item_blend[i] = blend[n]
        onehot[i, bi] = 1.0
    return win, item_start, item_b, item_blend, onehot


def build_window_sharded_denoise(
    unet,
    scheduler,
    mesh: Mesh,
    num_inference_steps: int,
    guidance_scale: float,
    num_frames: int,
    batch: int = 1,
    axis: str = "win",
    window: int = 8,
    stride: int = 6,
    compute_dtype=jnp.bfloat16,
    propagation_steps=(),
    pab=None,
):
    """Returns jitted ``denoise(params, latents, image_noised, prompt_embeds,
    denoise_level[, flows_f, flows_b]) -> latents`` with ALL video tensors
    replicated and the per-step window work sharded over ``axis``.

    latents: (B, T, H, W, 4); image_noised: (CFG·B, T, H, W, 3). Use this
    scheme whenever T/N < window (short clips on big meshes); it reproduces
    the serial window plan exactly for any T.

    ``pab`` (a ``pipeline.PABConfig``) enables multi-chip Pyramid Attention
    Broadcast: each chip carries the attention-delta cache for ITS items
    only, so the per-chip cache HBM shrinks ~N× vs the single-chip batched
    path — full-kind, all-level caching fits where one chip must drop
    levels (``skip_levels``). Item → chip assignment is static across steps,
    and every cache entry sees exactly the per-item sequence of states the
    single-chip batched run produces, so sharded-PAB ≡ single-chip-PAB
    bitwise (NOT ≡ exact semantics — PAB itself is approximate).
    """
    from ..models.propagation import propagate_latents

    n_dev = mesh.shape[axis]
    do_cfg = guidance_scale > 1.0
    bc = (2 if do_cfg else 1) * batch
    win, item_start, item_b, item_blend, onehot = _item_plan(
        num_frames, bc, n_dev, window, stride)
    ipd = len(item_start) // n_dev  # items per device

    timesteps = jnp.asarray(scheduler.timesteps(num_inference_steps))
    do_prop = bool(propagation_steps)
    prop_flags = jnp.asarray(
        [i in set(propagation_steps) for i in range(num_inference_steps)])
    offs = np.arange(win)

    if pab is not None:
        collect_struct = unet.make_pab_collect_cache(
            skip=pab.skip_levels,
            kinds=(None if set(pab.kinds) == {"spatial", "cross", "temporal"}
                   else pab.kinds))
        _fl = pab.use_cached_flags(num_inference_steps)
        pab_flag_xs = tuple(jnp.asarray(_fl[k])
                            for k in ("cross", "spatial", "temporal"))

    def local_denoise(params, latents, image_noised, prompt_embeds,
                      denoise_level, flows_f=None, flows_b=None):
        rank = jax.lax.axis_index(axis)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, rank * ipd, ipd)
        my_start = sl(jnp.asarray(item_start))
        my_b = sl(jnp.asarray(item_b))
        my_blend = sl(jnp.asarray(item_blend))          # (ipd, win, T)
        my_onehot = sl(jnp.asarray(onehot))             # (ipd, bc)
        frame_idx = my_start[:, None] + jnp.asarray(offs)[None, :]  # (ipd, win)

        def run_unet(lat_items, img_items, emb_items, lvl_items, tstep,
                     cache, flags):
            if pab is None:
                return unet.apply(params, lat_items, tstep, img_items,
                                  emb_items, lvl_items), None
            return unet.apply(params, lat_items, tstep, img_items, emb_items,
                              lvl_items, attn_cache=cache, use_flags=flags)

        def body(carry, step_in):
            if pab is not None:
                lat, cache = carry
                tstep, prop_now, f_cross, f_spatial, f_temporal = step_in
                flags = {"cross": f_cross, "spatial": f_spatial,
                         "temporal": f_temporal}
            else:
                lat = carry
                tstep, prop_now = step_in
                cache = flags = None
            latent_in = jnp.concatenate([lat, lat]) if do_cfg else lat

            # gather this chip's items: (ipd, win, H, W, C)
            lat_items = latent_in[my_b[:, None], frame_idx]
            img_items = image_noised[my_b[:, None], frame_idx]
            emb_items = prompt_embeds[my_b]
            lvl_items = denoise_level[my_b]

            preds, cache = run_unet(lat_items.astype(compute_dtype),
                                    img_items.astype(compute_dtype),
                                    emb_items, lvl_items, tstep, cache, flags)
            # partial blend on this chip, then one psum rebuilds the full
            # overlap-averaged prediction everywhere
            part = jnp.einsum("ikt,ib,ikhwc->bthwc", my_blend, my_onehot,
                              preds.astype(jnp.float32))
            noise_pred = jax.lax.psum(part, axis)

            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            x0 = scheduler.step_v0(noise_pred, tstep, lat)
            if do_prop:
                x0 = jax.lax.cond(
                    prop_now,
                    lambda v: propagate_latents(v, flows_f, flows_b),
                    lambda v: v, x0)
            new_lat = scheduler.step_vt(x0, noise_pred, tstep, lat,
                                        num_inference_steps)
            if pab is not None:
                return (new_lat, cache), ()
            return new_lat, ()

        if pab is not None:
            # zero-init the PER-CHIP cache (this chip's ipd items only)
            h, w = latents.shape[2], latents.shape[3]
            cache_shapes = jax.eval_shape(
                lambda p, l, i, e, lv: unet.apply(
                    p, l, jnp.int32(0), i, e, lv, attn_cache=collect_struct,
                    use_flags={"cross": False, "spatial": False,
                               "temporal": False})[1],
                params,
                jnp.zeros((ipd, win, h, w, 4), compute_dtype),
                jnp.zeros((ipd, win, h, w, 3), compute_dtype),
                prompt_embeds[my_b], denoise_level[my_b])
            cache0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  cache_shapes)
            xs = (timesteps, prop_flags) + pab_flag_xs
            (latents, _), _ = jax.lax.scan(body, (latents, cache0), xs)
            return latents

        latents, _ = jax.lax.scan(body, latents, (timesteps, prop_flags))
        return latents

    n_in = 7 if do_prop else 5
    sharded = shard_map(
        local_denoise, mesh=mesh,
        in_specs=(P(),) * n_in, out_specs=P(),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
