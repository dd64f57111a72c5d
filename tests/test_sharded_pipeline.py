"""Sharded denoise pipeline: multi-device run must match the single-device
pipeline (same window plan, same DDIM math) on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.parallel.sharded_pipeline import (
    build_sharded_denoise,
    shard_video,
)
from upscale_a_video_tpu.parallel.temporal import reference_windowed_apply
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


@pytest.mark.parametrize("n_dev,guidance", [(2, 1.0), (4, 3.0)])
@pytest.mark.slow
def test_sharded_matches_serial(setup, n_dev, guidance):
    unet, params, sched = setup
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("time",))
    steps = 2
    t = 12 * n_dev
    b = 1
    cfg_mult = 2 if guidance > 1.0 else 1

    latents0 = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(2),
                                     (cfg_mult * b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(3), (cfg_mult * b, 3, 16))
    lvl = jnp.full((cfg_mult * b,), 20, jnp.int32)

    # serial reference: python loop over steps, reference window plan
    lat = latents0
    for tt in sched.timesteps(steps):
        latent_in = jnp.concatenate([lat] * cfg_mult, axis=0)

        def apply_win(xw, img_w):
            return unet.apply(params, xw, int(tt), img_w, embeds, lvl)

        # windowed over the pair (latent, image): emulate with index capture
        preds = []
        tcur = latent_in.shape[1]
        out_slots = [None] * tcur
        for start in range(0, tcur, 6):
            end = min(tcur, start + 8)
            if end - start < 8:
                start = end - 8
            p = apply_win(latent_in[:, start:end], image_noised[:, start:end])
            for k, idx in enumerate(range(start, end)):
                if out_slots[idx] is None:
                    out_slots[idx] = p[:, k]
                else:
                    out_slots[idx] = out_slots[idx] * 0.5 + p[:, k] * 0.5
        pred = jnp.stack(out_slots, axis=1).astype(jnp.float32)
        if cfg_mult == 2:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (cond - uncond)
        x0 = sched.step_v0(pred, int(tt), lat)
        lat = sched.step_vt(x0, pred, int(tt), lat, steps)
    want = np.asarray(lat)

    denoise = build_sharded_denoise(unet, sched, mesh, steps, guidance,
                                    compute_dtype=jnp.float32)
    got = denoise(params, shard_video(latents0, mesh),
                  shard_video(image_noised, mesh), embeds, lvl)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_sharded_pab_matches_serial(setup):
    """PAB caches ride the sharded scan chip-locally; result must equal a
    serial loop threading one cache per global window."""
    from upscale_a_video_tpu.pipeline.pipeline import PABConfig

    unet, params, sched = setup
    n_dev, steps, t, b = 2, 3, 24, 1
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("time",))
    cfgp = PABConfig(cross_range=2, spatial_range=2, temporal_range=2,
                     start_step=1)

    latents0 = jax.random.normal(jax.random.PRNGKey(21), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(22), (b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(23), (b, 3, 16))
    lvl = jnp.full((b,), 20, jnp.int32)

    # serial: reference window plan with one PAB cache per global window
    starts = [0, 6, 12, 16]  # range(0,24,6) with the last right-aligned
    flags = cfgp.use_cached_flags(steps)
    caches = {s: unet.make_pab_collect_cache() for s in starts}
    lat = latents0
    for i, tt in enumerate(sched.timesteps(steps)):
        f = {k: bool(flags[k][i]) for k in flags}
        out_slots = [None] * t
        for s in starts:
            pred, caches[s] = unet.apply(
                params, lat[:, s:s + 8], int(tt), image_noised[:, s:s + 8],
                embeds, lvl, attn_cache=caches[s], use_flags=f)
            for k, idx in enumerate(range(s, s + 8)):
                out_slots[idx] = (pred[:, k] if out_slots[idx] is None
                                  else out_slots[idx] * 0.5 + pred[:, k] * 0.5)
        pred = jnp.stack(out_slots, axis=1).astype(jnp.float32)
        x0 = sched.step_v0(pred, int(tt), lat)
        lat = sched.step_vt(x0, pred, int(tt), lat, steps)
    want = np.asarray(lat)

    denoise = build_sharded_denoise(unet, sched, mesh, steps, 1.0,
                                    compute_dtype=jnp.float32, pab=cfgp)
    got = denoise(params, shard_video(latents0, mesh),
                  shard_video(image_noised, mesh), embeds, lvl)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_sharded_propagation_matches_serial(setup):
    """Distributed propagation (all-gather + replicated recurrence + slice)
    must equal the serial plan bit-for-bit semantics."""
    from upscale_a_video_tpu.models.propagation import propagate_latents

    unet, params, sched = setup
    # t_local = t/n_dev must be a multiple of the stride and >= the window
    # (windowed_apply_local's chunk-plan contract)
    n_dev, steps, t, b = 2, 3, 24, 1
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("time",))
    prop_steps = (1, 2)

    latents0 = jax.random.normal(jax.random.PRNGKey(11), (b, t, 8, 8, 4))
    image_noised = jax.random.normal(jax.random.PRNGKey(12), (b, t, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(13), (b, 3, 16))
    lvl = jnp.full((b,), 20, jnp.int32)
    flows_f = jax.random.normal(jax.random.PRNGKey(14), (b, t - 1, 8, 8, 2)) * 0.5
    flows_b = jax.random.normal(jax.random.PRNGKey(15), (b, t - 1, 8, 8, 2)) * 0.5

    lat = latents0
    for i, tt in enumerate(sched.timesteps(steps)):
        out_slots = [None] * t
        for start in range(0, t, 6):
            end = min(t, start + 8)
            if end - start < 8:
                start = end - 8
            p = unet.apply(params, lat[:, start:end], int(tt),
                           image_noised[:, start:end], embeds, lvl)
            for k, idx in enumerate(range(start, end)):
                out_slots[idx] = (p[:, k] if out_slots[idx] is None
                                  else out_slots[idx] * 0.5 + p[:, k] * 0.5)
        pred = jnp.stack(out_slots, axis=1).astype(jnp.float32)
        x0 = sched.step_v0(pred, int(tt), lat)
        if i in prop_steps:
            x0 = propagate_latents(x0, flows_f, flows_b)
        lat = sched.step_vt(x0, pred, int(tt), lat, steps)
    want = np.asarray(lat)

    denoise = build_sharded_denoise(unet, sched, mesh, steps, 1.0,
                                    compute_dtype=jnp.float32,
                                    propagation_steps=prop_steps)
    got = denoise(params, shard_video(latents0, mesh),
                  shard_video(image_noised, mesh), embeds, lvl,
                  flows_f, flows_b)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
