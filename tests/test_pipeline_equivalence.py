"""Pipeline vs a naive step-by-step reimplementation of the reference
algorithm (pipeline_upscale_a_video.py:599-663): the jitted scan + batched
windows + CFG must produce identical latents to an explicit Python loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler


class DummyTokenizer:
    def __call__(self, prompts):
        ids = np.full((len(prompts), 8), 3, dtype=np.int32)
        for i, p in enumerate(prompts):
            ids[i, 1] = abs(hash(p)) % 60
        return ids


@pytest.fixture(scope="module")
def setup():
    unet_cfg = UNetVideoConfig(
        block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=16,
    )
    vae_cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    clip_cfg = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=2, num_attention_heads=2,
                              max_position_embeddings=8)
    unet = UNetVideoModel(unet_cfg)
    vae = AutoencoderKLVideo(vae_cfg)
    clip = CLIPTextModel(clip_cfg)
    k = jax.random.PRNGKey(0)
    unet_params = unet.init(k, jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 8, 16)), 0)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    clip_params = clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
    lrs = DDPMScheduler()
    modules = PipelineModules(unet=unet, unet_params=unet_params, vae=vae,
                              vae_params=vae_params, text_encoder=clip,
                              text_params=clip_params, tokenizer=DummyTokenizer(),
                              scheduler=sched, low_res_scheduler=lrs)
    pipe = VideoUpscalePipeline(modules, dtype=jnp.float32)
    return pipe, unet, unet_params, sched, lrs


def naive_reference(pipe, unet, unet_params, sched, lrs, image, prompt_embeds,
                    steps, guidance, noise_level, key):
    """Explicit loop mirroring the reference __call__ for T <= 8."""
    b, t, h, w, _ = image.shape
    do_cfg = guidance > 1.0
    k, nkey, lkey = jax.random.split(key, 3)
    noise = jax.random.normal(nkey, image.shape, jnp.float32)
    noised = lrs.add_noise(image.astype(jnp.float32), noise,
                           jnp.full((b,), noise_level))
    mult = 2 if do_cfg else 1
    image_noised = jnp.concatenate([noised] * mult, axis=0)
    lvl = jnp.full((mult * b,), noise_level, dtype=jnp.int32)

    latents = jax.random.normal(lkey, (b, t, h, w, 4), jnp.float32)
    for tt in sched.timesteps(steps):
        latent_in = jnp.concatenate([latents] * mult, axis=0)
        pred = unet.apply(unet_params, latent_in, int(tt), image_noised,
                          prompt_embeds, lvl)
        pred = pred.astype(jnp.float32)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (cond - uncond)
        x0 = sched.step_v0(pred, int(tt), latents)
        latents = sched.step_vt(x0, pred, int(tt), latents, steps)
    return latents


@pytest.mark.parametrize("guidance", [1.0, 4.0])
@pytest.mark.slow
def test_scan_matches_naive_loop(setup, guidance):
    pipe, unet, unet_params, sched, lrs = setup
    image = jax.random.uniform(jax.random.PRNGKey(5), (1, 4, 8, 8, 3),
                               minval=-1, maxval=1)
    key = jax.random.PRNGKey(7)
    steps, nl = 3, 40

    prompt_embeds = pipe.encode_prompt(["p"], ["n"], guidance > 1.0)
    _, latents = pipe("p", image, num_inference_steps=steps,
                      guidance_scale=guidance, noise_level=nl,
                      negative_prompt="n", key=key, return_latents=True)
    want = naive_reference(pipe, unet, unet_params, sched, lrs, image,
                           prompt_embeds, steps, guidance, nl, key)
    np.testing.assert_allclose(np.asarray(latents), np.asarray(want),
                               atol=5e-4, rtol=1e-3)


def _clone_pipe(pipe, **kw):
    p = VideoUpscalePipeline(pipe.m, dtype=jnp.float32, **kw)
    return p


@pytest.mark.parametrize("guidance", [1.0, 4.0])
@pytest.mark.slow
def test_host_step_mode_matches_scan(setup, guidance):
    """step_mode='host' (one jitted step, host loop) must be numerically
    identical to the one-dispatch lax.scan path — incl. windows (T=10 > 8)
    and propagation under lax.cond."""
    pipe, unet, unet_params, sched, lrs = setup
    image = jax.random.uniform(jax.random.PRNGKey(6), (1, 10, 8, 8, 3),
                               minval=-1, maxval=1)
    key = jax.random.PRNGKey(11)
    flows_f = jax.random.normal(jax.random.PRNGKey(8), (1, 9, 8, 8, 2)) * 0.5
    flows_b = jax.random.normal(jax.random.PRNGKey(9), (1, 9, 8, 8, 2)) * 0.5
    kw = dict(num_inference_steps=3, guidance_scale=guidance, noise_level=30,
              key=key, flows_bi=(flows_f, flows_b), propagation_steps=(1,),
              return_latents=True)
    _, want = _clone_pipe(pipe)("p", image, **kw)
    _, got = _clone_pipe(pipe, step_mode="host")("p", image, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_host_step_mode_matches_scan_pab(setup):
    """Host stepping with a PAB cache carried across host-side steps must
    match the scan-carried cache exactly."""
    from upscale_a_video_tpu.pipeline.pipeline import PABConfig

    pipe, *_ = setup
    pab = PABConfig(cross_range=3, spatial_range=2, temporal_range=2,
                    start_step=1)
    image = jax.random.uniform(jax.random.PRNGKey(12), (1, 4, 8, 8, 3),
                               minval=-1, maxval=1)
    key = jax.random.PRNGKey(13)
    kw = dict(num_inference_steps=4, guidance_scale=3.0, noise_level=25,
              key=key, return_latents=True)
    _, want = _clone_pipe(pipe, pab=pab)("p", image, **kw)
    _, got = _clone_pipe(pipe, pab=pab, step_mode="host")("p", image, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_step_mode_validation(setup):
    pipe, *_ = setup
    with pytest.raises(ValueError, match="step_mode"):
        VideoUpscalePipeline(pipe.m, step_mode="bogus")


@pytest.mark.slow
def test_duplicate_tail_window_dedup_matches_naive(setup):
    """T=14 (starts 0,6,6 — duplicate right-aligned tail): the deduplicated
    window plan must still reproduce the reference's sequential loop, which
    really does run the duplicate window."""
    pipe, unet, unet_params, sched, lrs = setup
    image = jax.random.uniform(jax.random.PRNGKey(21), (1, 14, 8, 8, 3),
                               minval=-1, maxval=1)
    key = jax.random.PRNGKey(22)
    steps, nl, guidance = 2, 35, 3.0

    prompt_embeds = pipe.encode_prompt(["p"], ["n"], True)
    fresh = VideoUpscalePipeline(pipe.m, dtype=jnp.float32)
    _, latents = fresh("p", image, num_inference_steps=steps,
                       guidance_scale=guidance, noise_level=nl,
                       negative_prompt="n", key=key, return_latents=True)
    want = naive_windowed_reference(pipe, unet, unet_params, sched, lrs,
                                    image, prompt_embeds, steps, guidance,
                                    nl, key)
    np.testing.assert_allclose(np.asarray(latents), np.asarray(want),
                               atol=5e-4, rtol=1e-3)


def naive_windowed_reference(pipe, unet, unet_params, sched, lrs, image,
                             prompt_embeds, steps, guidance, noise_level, key):
    """Reference loop incl. the T>8 sliding-window branch with duplicates
    (pipeline_upscale_a_video.py:621-635)."""
    b, t, h, w, _ = image.shape
    do_cfg = guidance > 1.0
    k, nkey, lkey = jax.random.split(key, 3)
    noise = jax.random.normal(nkey, image.shape, jnp.float32)
    noised = lrs.add_noise(image.astype(jnp.float32), noise,
                           jnp.full((b,), noise_level))
    mult = 2 if do_cfg else 1
    image_noised = jnp.concatenate([noised] * mult, axis=0)
    lvl = jnp.full((mult * b,), noise_level, dtype=jnp.int32)
    latents = jax.random.normal(lkey, (b, t, h, w, 4), jnp.float32)

    for tt in sched.timesteps(steps):
        latent_in = jnp.concatenate([latents] * mult, axis=0)
        slots = [None] * t
        for start in range(0, t, 6):
            end = min(t, start + 8)
            if end - start < 8:
                start = end - 8
            p = unet.apply(unet_params, latent_in[:, start:end], int(tt),
                           image_noised[:, start:end], prompt_embeds, lvl)
            for kk, idx in enumerate(range(start, end)):
                slots[idx] = (p[:, kk] if slots[idx] is None
                              else slots[idx] * 0.5 + p[:, kk] * 0.5)
        pred = jnp.stack(slots, axis=1).astype(jnp.float32)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (cond - uncond)
        x0 = sched.step_v0(pred, int(tt), latents)
        latents = sched.step_vt(x0, pred, int(tt), latents, steps)
    return latents
