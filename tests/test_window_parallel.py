"""Window-parallel denoise: 8-device runs at the flagship clip geometry
(T=32, which the temporal-chunk scheme cannot shard) must match the serial
reference window plan exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.parallel.window_parallel import (
    build_window_sharded_denoise,
)
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig

TINY = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
    norm_num_groups=4, cross_attention_dim=16,
)


@pytest.fixture(scope="module")
def setup():
    unet = UNetVideoModel(TINY)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                       jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 3, 16)), 0)
    sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
    return unet, params, sched


def serial_denoise(unet, params, sched, steps, guidance, latents0,
                   image_noised, embeds, lvl, prop_steps=(), flows=None):
    """The reference's python loop: windows of 8 stride 6, sequential 0.5/0.5
    blend, CFG, DDIM split step, optional propagation."""
    from upscale_a_video_tpu.models.propagation import propagate_latents

    cfg_mult = 2 if guidance > 1.0 else 1
    lat = latents0
    t = lat.shape[1]
    for i, tt in enumerate(sched.timesteps(steps)):
        latent_in = jnp.concatenate([lat] * cfg_mult, axis=0)
        if t <= 8:
            # reference takes the single-call branch (ref :636-639)
            pred = unet.apply(params, latent_in, int(tt), image_noised,
                              embeds, lvl)
        else:
            # the reference's loop has NO break — T ≡ 2 (mod 6) computes the
            # right-aligned window twice and blends it again (ref :621-634)
            out_slots = [None] * t
            for start in range(0, t, 6):
                end = min(t, start + 8)
                if end - start < 8:
                    start = end - 8
                p = unet.apply(params, latent_in[:, start:end], int(tt),
                               image_noised[:, start:end], embeds, lvl)
                for k, idx in enumerate(range(start, end)):
                    out_slots[idx] = (p[:, k] if out_slots[idx] is None
                                      else out_slots[idx] * 0.5 + p[:, k] * 0.5)
            pred = jnp.stack(out_slots, axis=1)
        pred = pred.astype(jnp.float32)
        if cfg_mult == 2:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (cond - uncond)
        x0 = sched.step_v0(pred, int(tt), lat)
        if i in prop_steps:
            x0 = propagate_latents(x0, *flows)
        lat = sched.step_vt(x0, pred, int(tt), lat, steps)
    return np.asarray(lat)


@pytest.mark.parametrize("n_dev,t,guidance", [
    (8, 32, 3.0),   # flagship geometry: 32-frame clip on a full 8-chip mesh
    (8, 8, 1.0),    # clip == one window (degenerate plan)
    (4, 20, 3.0),   # uneven windows vs devices (padding path)
    (8, 5, 1.0),    # clip shorter than the window
])
@pytest.mark.slow
def test_window_sharded_matches_serial(setup, n_dev, t, guidance):
    unet, params, sched = setup
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))
    steps, b = 2, 1
    cfg_mult = 2 if guidance > 1.0 else 1

    latents0 = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(2),
                                     (cfg_mult * b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(3), (cfg_mult * b, 3, 16))
    lvl = jnp.full((cfg_mult * b,), 20, jnp.int32)

    want = serial_denoise(unet, params, sched, steps, guidance, latents0,
                          image_noised, embeds, lvl)
    denoise = build_window_sharded_denoise(
        unet, sched, mesh, steps, guidance, num_frames=t, batch=b,
        compute_dtype=jnp.float32)
    got = denoise(params, latents0, image_noised, embeds, lvl)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_window_sharded_with_propagation(setup):
    unet, params, sched = setup
    n_dev, steps, t, b = 8, 3, 32, 1
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))
    prop_steps = (1, 2)

    latents0 = jax.random.normal(jax.random.PRNGKey(11), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(12), (b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(13), (b, 3, 16))
    lvl = jnp.full((b,), 20, jnp.int32)
    flows = (jax.random.normal(jax.random.PRNGKey(14), (b, t - 1, 8, 8, 2)) * .5,
             jax.random.normal(jax.random.PRNGKey(15), (b, t - 1, 8, 8, 2)) * .5)

    want = serial_denoise(unet, params, sched, steps, 1.0, latents0,
                          image_noised, embeds, lvl, prop_steps, flows)
    denoise = build_window_sharded_denoise(
        unet, sched, mesh, steps, 1.0, num_frames=t, batch=b,
        compute_dtype=jnp.float32, propagation_steps=prop_steps)
    got = denoise(params, latents0, image_noised, embeds, lvl, *flows)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_window_sharded_batch2(setup):
    """Multiple clips in one sharded program (batched YouHQ40 eval)."""
    unet, params, sched = setup
    n_dev, steps, t, b = 8, 2, 14, 2
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))

    latents0 = jax.random.normal(jax.random.PRNGKey(31), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(32), (b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(33), (b, 3, 16))
    lvl = jnp.full((b,), 20, jnp.int32)

    want = serial_denoise(unet, params, sched, steps, 1.0, latents0,
                          image_noised, embeds, lvl)
    denoise = build_window_sharded_denoise(
        unet, sched, mesh, steps, 1.0, num_frames=t, batch=b,
        compute_dtype=jnp.float32)
    got = denoise(params, latents0, image_noised, embeds, lvl)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def single_chip_pab_denoise(unet, params, sched, steps, guidance, latents0,
                            image_noised, embeds, lvl, pab):
    """Single-chip PAB oracle: ALL window items in one batch (item order
    n·bc + b, matching pipeline.py's batched path), one zero-initialized
    attention cache threaded through an explicit python step loop."""
    from upscale_a_video_tpu.pipeline.windows import unique_window_plan

    cfg_mult = 2 if guidance > 1.0 else 1
    b, t, h, w, _ = latents0.shape
    bc = cfg_mult * b
    starts, blend = unique_window_plan(t, 8, 6)
    starts = np.asarray(starts)
    win = blend.shape[1]
    n_win = len(starts)
    win_idx = jnp.asarray(starts[:, None] + np.arange(win)[None, :])
    blend = jnp.asarray(blend)

    collect = unet.make_pab_collect_cache(
        skip=pab.skip_levels,
        kinds=(None if set(pab.kinds) == {"spatial", "cross", "temporal"}
               else pab.kinds))
    flags_np = pab.use_cached_flags(steps)

    def run(latent_in, tstep, cache, flags):
        lat_w = jnp.moveaxis(latent_in[:, win_idx], 0, 1).reshape(
            n_win * bc, win, h, w, 4)
        img_w = jnp.moveaxis(image_noised[:, win_idx], 0, 1).reshape(
            n_win * bc, win, h, w, 3)
        emb = jnp.tile(embeds, (n_win, 1, 1))
        lv = jnp.tile(lvl, (n_win,))
        out, cache = unet.apply(params, lat_w, tstep, img_w, emb, lv,
                                attn_cache=cache, use_flags=flags)
        preds = out.reshape(n_win, bc, win, h, w, 4)
        return jnp.einsum("nkt,nbkhwc->bthwc", blend, preds), cache

    cache_shapes = jax.eval_shape(
        lambda: run(jnp.zeros((bc, t, h, w, 4)), jnp.int32(0), collect,
                    {"cross": False, "spatial": False, "temporal": False})[1])
    cache = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

    lat = latents0
    for i, tt in enumerate(sched.timesteps(steps)):
        latent_in = jnp.concatenate([lat] * cfg_mult, axis=0)
        flags = {k: bool(flags_np[k][i])
                 for k in ("cross", "spatial", "temporal")}
        pred, cache = run(latent_in, int(tt), cache, flags)
        pred = pred.astype(jnp.float32)
        if cfg_mult == 2:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (cond - uncond)
        x0 = sched.step_v0(pred, int(tt), lat)
        lat = sched.step_vt(x0, pred, int(tt), lat, steps)
    return np.asarray(lat)


@pytest.mark.parametrize("kinds,skip", [
    (("spatial", "cross", "temporal"), ()),      # full-kind, all levels:
                                                 # the multi-chip payoff mode
    (("cross",), ("down_0",)),                   # restricted single-chip mode
])
@pytest.mark.slow
def test_window_sharded_pab_matches_single_chip(setup, kinds, skip):
    """Multi-chip PAB ≡ single-chip PAB (NOT ≡ exact — PAB approximates):
    each chip caches only its items' attention deltas, and the static
    item→chip assignment makes every cache entry see exactly the per-item
    state sequence of the single-chip batched run."""
    from upscale_a_video_tpu.pipeline.pipeline import PABConfig

    unet, params, sched = setup
    n_dev, t, guidance, steps, b = 8, 20, 3.0, 4, 1
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))
    pab = PABConfig(cross_range=3, spatial_range=2, temporal_range=2,
                    start_step=1, kinds=kinds, skip_levels=skip)

    latents0 = jax.random.normal(jax.random.PRNGKey(41), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(42), (2 * b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(43), (2 * b, 3, 16))
    lvl = jnp.full((2 * b,), 20, jnp.int32)

    want = single_chip_pab_denoise(unet, params, sched, steps, guidance,
                                   latents0, image_noised, embeds, lvl, pab)
    # exact oracle BEFORE the sharded call: build_window_sharded_denoise
    # donates the latents buffer
    exact = serial_denoise(unet, params, sched, steps, guidance, latents0,
                           image_noised, embeds, lvl)
    denoise = build_window_sharded_denoise(
        unet, sched, mesh, steps, guidance, num_frames=t, batch=b,
        compute_dtype=jnp.float32, pab=pab)
    got = np.asarray(denoise(params, latents0, image_noised, embeds, lvl))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # and PAB actually changed the result vs exact (the caches were USED)
    assert not np.allclose(got, exact, atol=1e-5)
