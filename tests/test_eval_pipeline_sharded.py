"""ShardedVideoUpscalePipeline == single-chip VideoUpscalePipeline on an
8-device CPU mesh (same seed, same modules), at a clip length the temporal
mesh cannot shard (T=10 on 8 devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tests.test_pipeline import DummyTokenizer
from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.parallel.eval_pipeline import ShardedVideoUpscalePipeline
from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler

TINY = UNetVideoConfig(block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
                       norm_num_groups=4, cross_attention_dim=16)


@pytest.fixture(scope="module")
def modules():
    unet = UNetVideoModel(TINY)
    vae = AutoencoderKLVideo(VaeConfig(block_out_channels=(8, 16, 16),
                                       norm_num_groups=4))
    clip = CLIPTextModel(CLIPTextConfig(vocab_size=64, hidden_size=16,
                                        intermediate_size=32, num_hidden_layers=2,
                                        num_attention_heads=2,
                                        max_position_embeddings=8))
    unet_params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 8, 16)), 0)
    return PipelineModules(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3))),
        text_encoder=clip,
        text_params=clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32)),
        tokenizer=DummyTokenizer(),
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )


@pytest.mark.slow
def test_sharded_pipeline_matches_single(modules, monkeypatch):
    # Pin f32 operand storage in the VAE mid attention: sharded-vs-
    # single latent noise (~1e-6) can straddle a bf16 rounding boundary
    # in the decode and amplify past the tolerance. These tests check
    # SHARDING mechanics; operand storage has its own test/bound.
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("win",))
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 10, 8, 8, 3),
                             minval=-1, maxval=1)
    key = jax.random.PRNGKey(10)

    single = VideoUpscalePipeline(modules, dtype=jnp.float32,
                                  decode_dtype=jnp.float32)
    want = single("p", img, num_inference_steps=2, guidance_scale=3.0,
                  noise_level=20, key=key)

    sharded = ShardedVideoUpscalePipeline(modules, mesh, dtype=jnp.float32,
                                          decode_dtype=jnp.float32)
    got = sharded("p", img, num_inference_steps=2, guidance_scale=3.0,
                  noise_level=20, key=key)

    assert got.shape == want.shape == (1, 10, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_sharded_pipeline_with_propagation(modules, monkeypatch):
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")  # see first test
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("win",))
    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 4, 8, 8, 3),
                             minval=-1, maxval=1)
    flows = (0.5 * jax.random.normal(jax.random.PRNGKey(7), (1, 3, 8, 8, 2)),
             0.5 * jax.random.normal(jax.random.PRNGKey(8), (1, 3, 8, 8, 2)))
    key = jax.random.PRNGKey(11)

    single = VideoUpscalePipeline(modules, dtype=jnp.float32,
                                  decode_dtype=jnp.float32)
    want = single("p", img, flows_bi=flows, num_inference_steps=3,
                  guidance_scale=3.0, noise_level=20,
                  propagation_steps=(1,), key=key)

    sharded = ShardedVideoUpscalePipeline(modules, mesh, dtype=jnp.float32,
                                          decode_dtype=jnp.float32)
    got = sharded("p", img, flows_bi=flows, num_inference_steps=3,
                  guidance_scale=3.0, noise_level=20,
                  propagation_steps=(1,), key=key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_sharded_pipeline_pab_matches_single_pab(modules, monkeypatch):
    """Drop-in sharded pipeline with PABConfig == single-chip pipeline with
    the same PABConfig (multi-chip PAB wired through _build_denoise)."""
    from upscale_a_video_tpu.pipeline.pipeline import PABConfig

    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")  # see first test
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("win",))
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, 10, 8, 8, 3),
                             minval=-1, maxval=1)
    key = jax.random.PRNGKey(12)
    pab = PABConfig(cross_range=2, spatial_range=2, temporal_range=2,
                    start_step=1)

    single = VideoUpscalePipeline(modules, dtype=jnp.float32,
                                  decode_dtype=jnp.float32, pab=pab,
                                  cfg_prefix_share=False)
    want = single("p", img, num_inference_steps=3, guidance_scale=3.0,
                  noise_level=20, key=key)

    sharded = ShardedVideoUpscalePipeline(modules, mesh, dtype=jnp.float32,
                                          decode_dtype=jnp.float32, pab=pab)
    got = sharded("p", img, num_inference_steps=3, guidance_scale=3.0,
                  noise_level=20, key=key)
    # Window-sharded batching changes matmul reduction orders (~1e-6/step
    # latent noise); PAB re-injects cached step-N deltas into step N+1, so
    # the noise compounds across the 3 steps — observed floor ~1e-4 abs,
    # ~8e-3 rel on 0.04% of pixels. A semantic break (wrong cache slot /
    # stale kind) produces O(1e-1) on most pixels.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)

    # PAB actually engaged (differs from the exact pipeline)
    exact = VideoUpscalePipeline(modules, dtype=jnp.float32,
                                 decode_dtype=jnp.float32)
    base = exact("p", img, num_inference_steps=3, guidance_scale=3.0,
                 noise_level=20, key=key)
    assert not np.allclose(np.asarray(got), np.asarray(base), atol=1e-6)
