"""CFG shared-prefix (UNetVideoModel ``cfg_dup``): the text-free level-0
prefix runs once per window and is duplicated before the first
cross-attention — must be EXACTLY the duplicated-batch CFG call
(ref pipeline_upscale_a_video.py:614 latent duplication)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.utils.param_init import fast_init

TINY = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    attention_head_dim=4,
    cross_attention_dim=16,
    norm_num_groups=4,
    num_class_embeds=1000,
)


def _unet_and_params(cfg=TINY, seed=0):
    unet = UNetVideoModel(cfg)
    params = fast_init(unet, jnp.zeros((1, 2, 16, 16, 4)), 0,
                       jnp.zeros((1, 2, 16, 16, 3)),
                       jnp.zeros((1, 77, cfg.cross_attention_dim)), 0,
                       zeros=False, seed=seed)
    return unet, params


@pytest.mark.parametrize("n", [1, 2])
@pytest.mark.slow
def test_cfg_dup_equals_duplicated_batch(n):
    cfg = TINY
    unet, params = _unet_and_params()
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    lat = jax.random.normal(ks[0], (n, 2, 16, 16, 4))
    lr = jax.random.normal(ks[1], (n, 2, 16, 16, 3))
    ctx = jax.random.normal(ks[2], (2 * n, 77, cfg.cross_attention_dim))

    # reference: duplicated batch (concat halves), ctx as passed
    ref = unet.apply(params, jnp.concatenate([lat, lat]), 500,
                     jnp.concatenate([lr, lr]), ctx, 120)
    got = unet.apply(params, lat, 500, lr, ctx, 120, cfg_dup=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_cfg_dup_first_block_crossattn_still_exact():
    """A config whose FIRST down block is cross-attention (tile happens
    immediately; zero savings but must stay correct)."""
    cfg = dataclasses.replace(
        TINY, down_block_types=("CrossAttnDownBlock3D",) * 4,
        only_cross_attention=(True, True, True, False))
    unet, params = _unet_and_params(cfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    lat = jax.random.normal(ks[0], (1, 2, 16, 16, 4))
    lr = jax.random.normal(ks[1], (1, 2, 16, 16, 3))
    ctx = jax.random.normal(ks[2], (2, 77, cfg.cross_attention_dim))
    ref = unet.apply(params, jnp.concatenate([lat, lat]), 500,
                     jnp.concatenate([lr, lr]), ctx, 120)
    got = unet.apply(params, lat, 500, lr, ctx, 120, cfg_dup=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_cfg_dup_with_pab_cache_matches():
    """cfg_dup composes with the PAB attention cache (cache collected on the
    post-duplication batch): outputs and cache leaves match the duplicated
    call."""
    cfg = TINY
    unet, params = _unet_and_params()
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    lat = jax.random.normal(ks[0], (1, 2, 16, 16, 4))
    lr = jax.random.normal(ks[1], (1, 2, 16, 16, 3))
    ctx = jax.random.normal(ks[2], (2, 77, cfg.cross_attention_dim))
    struct = unet.make_pab_collect_cache()
    flags = {"cross": jnp.asarray(False), "spatial": jnp.asarray(False),
             "temporal": jnp.asarray(False)}

    ref, ref_cache = unet.apply(params, jnp.concatenate([lat, lat]), 500,
                                jnp.concatenate([lr, lr]), ctx, 120,
                                attn_cache=struct, use_flags=flags)
    got, got_cache = unet.apply(params, lat, 500, lr, ctx, 120,
                                attn_cache=struct, use_flags=flags,
                                cfg_dup=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_cache),
                    jax.tree_util.tree_leaves(ref_cache)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def _tiny_pipeline(cfg_prefix_share: bool):
    from upscale_a_video_tpu.config import VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo
    from upscale_a_video_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
    )
    from upscale_a_video_tpu.pipeline.pipeline import (
        PipelineModules,
        VideoUpscalePipeline,
    )
    from upscale_a_video_tpu.sampling import (
        DDIMScheduler,
        DDIMSchedulerConfig,
        DDPMScheduler,
    )

    class Tok:
        def __call__(self, prompts):
            import zlib

            out = np.full((len(prompts), 8), 3, dtype=np.int32)
            for i, p in enumerate(prompts):
                out[i, 0] = 1
                # crc32, not hash(): hash() is PYTHONHASHSEED-randomized →
                # different ids per pytest process → flaky tolerances
                out[i, 1] = zlib.crc32(p.encode()) % 60
            return out

    key = jax.random.PRNGKey(0)
    unet_cfg = TINY
    vae_cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    clip_cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=8)
    unet = UNetVideoModel(unet_cfg)
    vae = AutoencoderKLVideo(vae_cfg)
    clip = CLIPTextModel(clip_cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    modules = PipelineModules(
        unet=unet,
        unet_params=unet.init(k1, jnp.zeros((1, 2, 8, 8, 4)), 0,
                              jnp.zeros((1, 2, 8, 8, 3)),
                              jnp.zeros((1, 8, 16)), 0),
        vae=vae, vae_params=vae.init(k2, jnp.zeros((1, 1, 8, 8, 3))),
        text_encoder=clip,
        text_params=clip.init(k3, jnp.zeros((1, 8), dtype=jnp.int32)),
        tokenizer=Tok(),
        scheduler=DDIMScheduler(
            DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    return VideoUpscalePipeline(modules, dtype=jnp.float32,
                                cfg_prefix_share=cfg_prefix_share)


@pytest.mark.slow
def test_pipeline_share_with_window_groups(monkeypatch):
    """share composes with grouped windows (lax.map branch): T=20 → 4
    windows in groups of 2; share on == share off."""
    # Pin f32 operand storage in the VAE mid attention: with the default
    # bf16 operands, on/off latent noise (~1e-6) can straddle a bf16
    # rounding boundary in the decode and amplify past the tolerance.
    # This test is about SHARE mechanics; operand storage has its own test.
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 20, 8, 8, 3),
                             jnp.float32, -1, 1)
    outs = {}
    for share in (False, True):
        pipe = _tiny_pipeline(share)
        pipe.window_group = 2
        outs[share] = np.asarray(
            pipe("p", img, num_inference_steps=2, guidance_scale=6.0,
                 noise_level=20))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pipeline_share_on_off_identical(monkeypatch):
    """Full pipeline with cfg_prefix_share on vs off: same outputs
    (identical init keys ⇒ identical params ⇒ the only difference is the
    shared-prefix batching)."""
    # f32 operand storage for the same reason as
    # test_pipeline_share_with_window_groups (bf16 rounding amplification).
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 4, 16, 16, 3),
                             jnp.float32, -1, 1)
    outs = {
        share: np.asarray(
            _tiny_pipeline(share)("p", img, num_inference_steps=3,
                                  guidance_scale=6.0, noise_level=20))
        for share in (False, True)
    }
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-4)
